"""Numerical-equivalence probes for debugging the speculative pipeline.

Capability parity with the reference's debugging mechanisms (SURVEY.md §4.3):
  - ``sd_test5``-style draft/target logit-diff checker
    (reference: tmp/var.py:924-1037): run both models to a handoff point on
    the SAME drafted prefix and report max |Δlogits| per scale — the tool
    that caught the original handoff re-embedding bugs;
  - handoff-invariance check (the fixed-RNG lesson, tmp/var.py:328-615):
    with greedy sampling and draft == target, outputs must be identical for
    every entry_num;
  - acceptance-telemetry summarizer for γ sweeps.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import SamplingConfig, SpeculativeConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales, init_decode, scale_step
from sdvar_tpu.engine.speculative import SpeculativeEngine, _target_verify_window


def logit_diff_probe(
    eng: SpeculativeEngine, label_B: jnp.ndarray, key: jax.Array,
    samp: SamplingConfig = SamplingConfig(),
    upto_scale: int | None = None,
) -> List[Dict]:
    """sd_test5 equivalent (reference: tmp/var.py:924-1037, the Δlogits
    print at :1026-1029): drive the draft scale-by-scale; at each scale,
    BOTH models verify the identical drafted prefix (γ=1 window, same hub
    inputs, each re-embedded with its own word_embed) and the probe reports
    per scale:

      - ``logit_absdiff_max``: max |draft CFG'd logits − target CFG'd
        logits| on the same token slice (with draft == target this is ~0);
      - ``match_rate``: top-1 agreement between the draft's SAMPLED tokens
        and the target's argmax (the acceptance statistic);
      - ``target_logit_absmax``: magnitude context for the diff.
    """
    S = eng.num_scales if upto_scale is None else upto_scale
    d_state, d_sos, d_lvl = init_decode(
        eng.draft_cfg, eng.draft_params, label_B, eng.dtype
    )
    t_state, t_sos, t_lvl = init_decode(
        eng.target_cfg, eng.target_params, label_B, eng.dtype
    )
    # verification caches, threaded scale-by-scale: the draft gets its OWN
    # verify cache so probing never perturbs its decode cache
    t_cache = t_state.cache
    d_vcache = init_decode(eng.draft_cfg, eng.draft_params, label_B,
                           eng.dtype)[0].cache
    dkey = jax.random.fold_in(key, 1)

    report = []
    for si in range(S):
        prev_map = d_state.next_map
        d_state, d_ids = scale_step(
            eng.draft_cfg, eng.vae_cfg, eng.draft_params, eng.quant_params,
            si, d_state, d_sos, d_lvl, dkey, samp, eng.dtype,
        )
        hub_in = () if si == 0 else (prev_map,)
        t_argmax, t_logits, t_cache = _target_verify_window(
            eng.target_cfg, eng.target_params, si, 1, t_cache,
            t_sos, t_lvl, hub_in, samp, eng.dtype,
        )
        _, d_logits, d_vcache = _target_verify_window(
            eng.draft_cfg, eng.draft_params, si, 1, d_vcache,
            d_sos, d_lvl, hub_in, samp, eng.dtype,
        )
        match = float(jnp.mean((d_ids == t_argmax[0]).astype(jnp.float32)))
        report.append({
            "scale": si,
            "match_rate": match,
            "logit_absdiff_max": float(
                jnp.max(jnp.abs(d_logits[0] - t_logits[0]))
            ),
            "target_logit_absmax": float(jnp.max(jnp.abs(t_logits[0]))),
        })
    return report


def handoff_invariance_probe(
    eng: SpeculativeEngine, label_B: jnp.ndarray, key: jax.Array,
    cfg_strength: float = 1.5,
) -> Dict:
    """Greedy + self-draft: the handoff output must match the baseline decode
    for EVERY entry_num (the reference's hardest-won reproducibility bug,
    tmp/var.py:341-382). Returns per-entry_num max |Δf_hat|."""
    samp = SamplingConfig(cfg=cfg_strength, top_k=1)
    base = decode_all_scales(
        eng.target_cfg, eng.vae_cfg, eng.target_params, eng.quant_params,
        label_B, key, samp, eng.dtype,
    )
    diffs = {}
    for entry in range(1, eng.num_scales + 1):
        f_hat, _ = eng.generate_handoff(
            label_B, key, entry_num=entry, sd_mask=3, samp=samp
        )
        diffs[entry] = float(jnp.max(jnp.abs(f_hat - base)))
    return diffs


def gamma_sweep(
    eng: SpeculativeEngine, label_B: jnp.ndarray, key: jax.Array,
    gammas=(1, 2, 3), samp: SamplingConfig = SamplingConfig(),
) -> List[Dict]:
    """Acceptance/target-call telemetry per γ (the notebook's γ sweep,
    reference: sdvar_colab_test.py:189-260)."""
    out = []
    for g in gammas:
        _, stats = eng.generate_speculative(
            label_B, key, SpeculativeConfig(gamma=g), samp
        )
        d = stats.as_dict()
        d["gamma"] = g
        d["mean_match_rate"] = (
            float(np.mean(d["match_rates"])) if d["match_rates"] else 0.0
        )
        out.append(d)
    return out
