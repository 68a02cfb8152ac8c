"""FID sampling driver: class-balanced schedule + end-to-end tiny pipeline
(reference protocol: README.md:151-157; packer parity utils/misc.py:360-381).
"""

import numpy as np

import jax
import jax.numpy as jnp

from sdvar_tpu.sample_fid import balanced_labels, sample_batches


def test_balanced_labels():
    lb = balanced_labels(50_000)
    assert len(lb) == 50_000
    counts = np.bincount(lb, minlength=1000)
    assert (counts == 50).all()
    lb = balanced_labels(1003, num_classes=10)
    assert len(lb) == 1003
    counts = np.bincount(lb, minlength=10)
    assert counts[:3].tolist() == [101, 101, 101] and (counts[3:] == 100).all()


def test_pipeline_tiny(tmp_path):
    from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.models.vqvae import init_vqvae_params
    from sdvar_tpu.utils.fid import create_npz_from_arrays

    pns = (1, 2, 3)
    var_cfg = VARConfig(depth=2, patch_nums=pns, vocab_size=64, Cvae=8,
                        num_classes=10, head_dim=16)
    vae_cfg = VQVAEConfig(patch_nums=pns, vocab_size=64, z_channels=8, ch=32)
    key = jax.random.PRNGKey(0)
    var_params = init_var_params(var_cfg, key)
    vae_params = init_vqvae_params(vae_cfg, jax.random.fold_in(key, 1))
    vae_params["quant"] = init_quantizer_params(
        vae_cfg, jax.random.fold_in(key, 2), eini=1.0)

    labels = balanced_labels(5, num_classes=10)
    batches = list(sample_batches(
        var_cfg, vae_cfg, var_params, vae_params, labels, batch=2,
        samp=SamplingConfig(cfg=1.5, top_k=8), dtype=jnp.float32,
        log_every=0,
    ))
    total = sum(b.shape[0] for b in batches)
    assert total == 5
    for b in batches:
        assert b.ndim == 4 and b.shape[1] == 3
        assert np.isfinite(b).all() and b.min() >= 0.0 and b.max() <= 1.0

    out = str(tmp_path / "samples.npz")
    create_npz_from_arrays(iter(batches), out, num=5)
    arr = np.load(out)["arr_0"]
    assert arr.shape[0] == 5 and arr.dtype == np.uint8
