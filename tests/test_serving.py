"""Continuous-batching server tests: batch-composition-independent
determinism and completion under async load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.serving import GenerationServer
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params

PNS = (1, 2, 3)


@pytest.fixture(scope="module")
def server_stack():
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    key = jax.random.PRNGKey(0)
    vae_params = init_vqvae_params(vae_cfg, key)
    var_params = init_var_params(var_cfg, jax.random.fold_in(key, 1))
    return var_cfg, vae_cfg, var_params, vae_params


def _mk(server_stack, **kw):
    var_cfg, vae_cfg, var_params, vae_params = server_stack
    return GenerationServer(
        var_cfg, vae_cfg, var_params, vae_params,
        samp=SamplingConfig(cfg=1.5, top_k=8),
        dtype=jnp.float32, buckets=[1, 2, 4], max_batch=4, **kw
    )


def test_all_requests_complete(server_stack):
    srv = _mk(server_stack)
    srv.start()
    try:
        ids = [srv.submit(label=i % 10, seed=100 + i) for i in range(7)]
        results = [srv.get(i, timeout=180) for i in ids]
    finally:
        srv.stop()
    for r in results:
        assert r.image is not None and r.image.shape == (3, 48, 48)
        assert np.isfinite(r.image).all()
    assert srv.stats["completed"] == 7


def test_determinism_across_batch_composition(server_stack):
    """The same (label, seed) must yield the same image whether it was
    batched alone or with other requests."""
    srv = _mk(server_stack, max_wait_ms=0.0)
    srv.start()
    try:
        solo = srv.get(srv.submit(label=3, seed=7), timeout=180)
    finally:
        srv.stop()

    srv2 = _mk(server_stack, max_wait_ms=200.0)
    srv2.start()
    try:
        ids = [srv2.submit(label=3, seed=7),
               srv2.submit(label=5, seed=8),
               srv2.submit(label=1, seed=9)]
        batched = [srv2.get(i, timeout=180) for i in ids]
    finally:
        srv2.stop()

    # token ids are bit-identical across batch compositions (verified at the
    # decode layer); the conv image decoder may reassociate sums per batch
    # size, so images agree to float tolerance rather than bitwise
    np.testing.assert_allclose(solo.image, batched[0].image,
                               rtol=1e-5, atol=1e-5)
    # different seeds genuinely differ
    assert np.abs(batched[0].image - batched[1].image).max() > 1e-3
