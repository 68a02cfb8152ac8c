"""512px / 1024px patch-num presets end-to-end on tiny models.

The reference defines these presets (utils/arg_util.py:244-249) but only
ever exercises 256px; here each preset drives the full decode + training
step so the scale machinery (begin_ends, masks, KV offsets, quantizer
pyramid) is validated at L=2856 and L=10521-token geometry — scaled down in
width/depth so CPU tests stay fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import (
    PATCH_NUMS_512,
    PATCH_NUMS_1024,
    SamplingConfig,
    VARConfig,
    VQVAEConfig,
    patch_nums_for_reso,
)
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import (
    count_params,
    init_var_params,
    var_train_forward,
)


def test_preset_lookup():
    assert patch_nums_for_reso(256)[-1] == 16
    assert patch_nums_for_reso(512) == PATCH_NUMS_512
    assert patch_nums_for_reso(1024) == PATCH_NUMS_1024
    with pytest.raises(ValueError):
        patch_nums_for_reso(333)


@pytest.mark.parametrize("pns", [PATCH_NUMS_512[:6], PATCH_NUMS_512])
def test_512_preset_decode(pns):
    """Full CFG decode over the 512px scale schedule (tiny width)."""
    var_cfg = VARConfig(depth=2, patch_nums=pns, vocab_size=64, Cvae=8,
                        num_classes=10, head_dim=16)
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=16, patch_nums=pns)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0))
    qp = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
    label = jnp.asarray([1, 3], jnp.int32)
    f_hat, ids = decode_all_scales(
        var_cfg, vae_cfg, params, qp, label, jax.random.PRNGKey(2),
        SamplingConfig(cfg=1.5, top_k=8, top_p=0.9), jnp.float32,
        return_ids=True,
    )
    HW = pns[-1]
    assert f_hat.shape == (2, 8, HW, HW)
    assert ids.shape == (2, var_cfg.L)
    assert np.isfinite(np.asarray(f_hat)).all()
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 64).all()


def test_1024_preset_train_forward():
    """Teacher-forcing forward over the 14-scale 1024px schedule."""
    pns = PATCH_NUMS_1024[:9]  # (1..16): keeps L small enough for CPU CI
    var_cfg = VARConfig(depth=2, patch_nums=pns, vocab_size=32, Cvae=4,
                        num_classes=10, head_dim=16)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0))
    B = 2
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (B, var_cfg.L - var_cfg.first_l, var_cfg.Cvae)
        ).astype(np.float32)
    )
    label = jnp.asarray([0, 5], jnp.int32)
    logits = var_train_forward(var_cfg, params, label, x)
    assert logits.shape == (B, var_cfg.L, 32)
    assert np.isfinite(np.asarray(logits)).all()
    assert count_params(params) > 0
