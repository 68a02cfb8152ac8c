"""Probe-utility tests: handoff invariance and γ-sweep telemetry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.probes import (
    gamma_sweep,
    handoff_invariance_probe,
    logit_diff_probe,
)
from sdvar_tpu.engine.speculative import SpeculativeEngine
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params

PNS = (1, 2, 3)


@pytest.fixture(scope="module")
def eng():
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    key = jax.random.PRNGKey(0)
    params = init_var_params(var_cfg, key)
    params["head"]["w"] = params["head"]["w"] * 30.0
    quant = init_quantizer_params(vae_cfg, jax.random.fold_in(key, 1),
                                  eini=1.0)
    return SpeculativeEngine(
        vae_cfg, var_cfg, var_cfg, {"quant": quant}, params, params,
        dtype=jnp.float32,
    )


def test_handoff_invariance_selfdraft_greedy(eng):
    """Self-draft + greedy: handoff must equal baseline for EVERY entry_num
    (tmp/var.py:341-382 regression, solved structurally via key folding)."""
    diffs = handoff_invariance_probe(eng, jnp.array([2]), jax.random.PRNGKey(3))
    for entry, d in diffs.items():
        assert d < 1e-4, (entry, d)


def test_logit_diff_probe_selfdraft(eng):
    rep = logit_diff_probe(eng, jnp.array([1]), jax.random.PRNGKey(5),
                           SamplingConfig(cfg=1.5, top_k=1))
    assert len(rep) == len(PNS)
    # greedy self-draft: target argmax == draft tokens at every scale, and
    # the two models' CFG'd logits on the identical prefix are identical
    # (the sd_test5 check, tmp/var.py:1026-1029)
    for row in rep:
        assert row["match_rate"] == 1.0, row
        assert row["logit_absdiff_max"] < 1e-4, row
        assert row["target_logit_absmax"] > 0


def test_logit_diff_probe_distinct_models(eng):
    """With a genuinely different draft the Δlogits must be visibly nonzero
    — the probe's reason to exist (catching handoff re-embedding bugs)."""
    vae_cfg = eng.vae_cfg
    draft_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                          vocab_size=64, Cvae=8, head_dim=16,
                          cond_drop_rate=0.0, drop_path_rate=0.0)
    draft_params = init_var_params(draft_cfg, jax.random.PRNGKey(11))
    eng2 = SpeculativeEngine(
        vae_cfg, draft_cfg, eng.target_cfg, eng.vae_params,
        draft_params, eng.target_params, dtype=jnp.float32,
    )
    rep = logit_diff_probe(eng2, jnp.array([1]), jax.random.PRNGKey(5),
                           SamplingConfig(cfg=1.5, top_k=1),
                           upto_scale=2)
    assert len(rep) == 2  # upto_scale=2 honored
    assert all(row["logit_absdiff_max"] > 1e-2 for row in rep), rep


def test_gamma_sweep_telemetry(eng):
    rows = gamma_sweep(eng, jnp.array([3]), jax.random.PRNGKey(7),
                       gammas=(1, 2), samp=SamplingConfig(cfg=1.5, top_k=1))
    assert [r["gamma"] for r in rows] == [1, 2]
    for r in rows:
        assert r["accept_count"] == len(PNS)
        assert r["mean_match_rate"] == 1.0
