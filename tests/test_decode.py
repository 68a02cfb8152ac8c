"""End-to-end decode tests: golden parity vs the reference CFG decode loop
(greedy), determinism, and full-jit vs stepwise equivalence."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig  # noqa: E402
from sdvar_tpu.engine.decode import (  # noqa: E402
    decode_all_scales,
    generate_images,
    init_decode,
    scale_step,
)

PNS = (1, 2, 3)


@pytest.fixture(scope="module")
def small_stack():
    """Small random reference VQVAE+VAR, ported to our pytrees."""
    from models.var import VAR
    from models.vqvae import VQVAE

    from sdvar_tpu.utils.torch_port import (
        var_params_from_torch,
        vqvae_params_from_torch,
    )

    torch.manual_seed(11)
    vae = VQVAE(vocab_size=64, z_channels=8, ch=32, test_mode=True,
                v_patch_nums=PNS)
    ref_var = VAR(
        vae_local=vae, num_classes=10, depth=2, embed_dim=64, num_heads=2,
        attn_l2_norm=True, patch_nums=PNS, cond_drop_rate=0.0,
        flash_if_available=False, fused_if_available=False, drop_path_rate=0.0,
    ).eval()
    # give the head real values (ctor leaves defaults; make logits distinct)
    with torch.no_grad():
        ref_var.head.weight.normal_(0, 0.05)
        ref_var.head.bias.normal_(0, 0.05)
        vae.quantize.embedding.weight.normal_(0, 1.0)

    var_cfg = VARConfig(
        depth=2, num_classes=10, patch_nums=PNS, vocab_size=64, Cvae=8,
        attn_l2_norm=True, cond_drop_rate=0.0, drop_path_rate=0.0, head_dim=32,
    )
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_params = var_params_from_torch(var_cfg, ref_var.state_dict())
    vae_params = vqvae_params_from_torch(vae_cfg, vae.state_dict())
    return var_cfg, vae_cfg, ref_var, vae, var_params, vae_params


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_greedy_decode_matches_reference(small_stack):
    """top_k=1 makes the reference's multinomial deterministic; images from
    both decoders must agree (reference: models/var.py:127-215)."""
    var_cfg, vae_cfg, ref_var, vae, var_params, vae_params = small_stack
    B = 2
    label = np.array([3, 7], dtype=np.int64)
    with torch.no_grad():
        ref_img = ref_var.autoregressive_infer_cfg(
            B=B, label_B=torch.from_numpy(label), cfg=1.5, top_k=1, top_p=0.0,
        ).numpy()
    got = np.asarray(
        generate_images(
            var_cfg, vae_cfg, var_params, vae_params,
            jnp.asarray(label), jax.random.PRNGKey(0),
            SamplingConfig(cfg=1.5, top_k=1), dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ref_img, got, rtol=1e-3, atol=1e-3)


def test_decode_deterministic_under_key(small_stack):
    var_cfg, vae_cfg, _, _, var_params, vae_params = small_stack
    label = jnp.array([1, 2])
    samp = SamplingConfig(cfg=1.5, top_k=8, top_p=0.9)
    k = jax.random.PRNGKey(42)
    a = decode_all_scales(var_cfg, vae_cfg, var_params, vae_params["quant"],
                          label, k, samp, jnp.float32)
    b = decode_all_scales(var_cfg, vae_cfg, var_params, vae_params["quant"],
                          label, k, samp, jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = decode_all_scales(var_cfg, vae_cfg, var_params, vae_params["quant"],
                          label, jax.random.PRNGKey(43), samp, jnp.float32)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_stepwise_equals_full_jit(small_stack):
    """The speculative engine drives scale_step individually; it must
    reproduce the one-shot compiled decode exactly."""
    var_cfg, vae_cfg, _, _, var_params, vae_params = small_stack
    label = jnp.array([5])
    samp = SamplingConfig(cfg=1.0, top_k=4)
    key = jax.random.PRNGKey(7)
    full, full_ids = decode_all_scales(
        var_cfg, vae_cfg, var_params, vae_params["quant"], label, key, samp,
        jnp.float32, return_ids=True,
    )
    state, sos, lvl_pos = init_decode(var_cfg, var_params, label, jnp.float32)
    ids_all = []
    for si in range(var_cfg.num_scales):
        state, ids = scale_step(
            var_cfg, vae_cfg, var_params, vae_params["quant"], si, state,
            sos, lvl_pos, key, samp, jnp.float32,
        )
        ids_all.append(ids)
    np.testing.assert_array_equal(
        np.asarray(full_ids), np.asarray(jnp.concatenate(ids_all, axis=1))
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(state.f_hat), rtol=1e-5, atol=1e-5
    )
