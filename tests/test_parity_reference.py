"""Golden parity tests against the reference implementation as oracle.

The reference repo (read-only at /root/reference) is imported in torch-CPU
mode, instantiated with random weights, and its state_dict is ported into our
pytrees via utils/torch_port; forwards must then agree numerically. This is
the test layer the reference itself lacks (SURVEY.md §4).

Skipped cleanly when /root/reference is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_models():
    torch.manual_seed(0)
    from models.quant import VectorQuantizer2  # reference
    from models.var import VAR  # reference
    from models.vqvae import VQVAE  # reference

    return VectorQuantizer2, VAR, VQVAE


PNS = (1, 2, 3)


def _small_vq_cfgs():
    from sdvar_tpu.config import VQVAEConfig

    return VQVAEConfig(
        vocab_size=64, z_channels=8, ch=32, patch_nums=PNS,
        share_quant_resi=4,
    )


@pytest.fixture(scope="module")
def quant_pair(ref_models):
    """Reference VectorQuantizer2 + ported params, random weights."""
    VectorQuantizer2, _, _ = ref_models
    cfg = _small_vq_cfgs()
    torch.manual_seed(1)
    q = VectorQuantizer2(
        vocab_size=cfg.vocab_size, Cvae=cfg.Cvae, using_znorm=False,
        v_patch_nums=PNS, quant_resi=0.5, share_quant_resi=4,
    ).eval()
    with torch.no_grad():
        q.embedding.weight.normal_(0, 1.0)
    from sdvar_tpu.utils.torch_port import quantizer_params_from_torch

    sd = {f"quantize.{k}": v for k, v in q.state_dict().items()}
    params = quantizer_params_from_torch(cfg, sd)
    return cfg, q, params


def test_phi_index_matches_reference(quant_pair):
    cfg, q, _ = quant_pair
    for si in range(len(PNS)):
        ref_phi = q.quant_resi[si / (len(PNS) - 1)]
        ours = cfg.phi_index(si)
        ref_idx = None
        for k, m in enumerate(q.quant_resi.qresi_ls):
            if m is ref_phi:
                ref_idx = k
        assert ref_idx == ours, (si, ref_idx, ours)


def test_quantizer_encode_parity(quant_pair):
    cfg, q, params = quant_pair
    from sdvar_tpu.models import quantizer as Q

    rng = np.random.default_rng(0)
    f = rng.standard_normal((2, cfg.Cvae, PNS[-1], PNS[-1])).astype(np.float32)
    with torch.no_grad():
        ref_ids = q.f_to_idxBl_or_fhat(torch.from_numpy(f), to_fhat=False)
        ref_fhat = q.f_to_idxBl_or_fhat(torch.from_numpy(f), to_fhat=True)
    got_ids = Q.encode(cfg, params, f)
    got_fhat = Q.encode(cfg, params, f, return_fhat=True)
    for r, g in zip(ref_ids, got_ids):
        np.testing.assert_array_equal(r.numpy(), np.asarray(g))
    np.testing.assert_allclose(
        ref_fhat[-1].numpy(), np.asarray(got_fhat[-1]), rtol=1e-4, atol=1e-5
    )


def test_quantizer_var_input_parity(quant_pair):
    cfg, q, params = quant_pair
    from sdvar_tpu.models import quantizer as Q

    rng = np.random.default_rng(1)
    ids = [
        rng.integers(0, cfg.vocab_size, (2, pn * pn), dtype=np.int64)
        for pn in PNS
    ]
    with torch.no_grad():
        ref = q.idxBl_to_var_input([torch.from_numpy(i) for i in ids])
    got = Q.idx_to_var_input(cfg, params, [np.asarray(i) for i in ids])
    np.testing.assert_allclose(ref.numpy(), np.asarray(got), rtol=1e-4, atol=1e-5)


def test_next_autoregressive_input_parity(quant_pair):
    cfg, q, params = quant_pair
    from sdvar_tpu.models import quantizer as Q

    rng = np.random.default_rng(2)
    HW = PNS[-1]
    for si, pn in enumerate(PNS):
        f_hat = rng.standard_normal((2, cfg.Cvae, HW, HW)).astype(np.float32)
        h = rng.standard_normal((2, cfg.Cvae, pn, pn)).astype(np.float32)
        with torch.no_grad():
            rf, rnext = q.get_next_autoregressive_input(
                si, len(PNS), torch.from_numpy(f_hat.copy()), torch.from_numpy(h)
            )
        gf, gnext = Q.next_autoregressive_input(cfg, params, si, f_hat, h)
        np.testing.assert_allclose(rf.numpy(), np.asarray(gf), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            rnext.numpy(), np.asarray(gnext), rtol=1e-4, atol=1e-5
        )


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "l2norm"])
def var_pair(request, ref_models):
    """Reference VAR (small) + ported params."""
    _, VAR, VQVAE = ref_models
    attn_l2 = request.param
    torch.manual_seed(3)
    vae = VQVAE(vocab_size=64, z_channels=8, ch=32, test_mode=True,
                v_patch_nums=PNS)
    ref_var = VAR(
        vae_local=vae, num_classes=10, depth=2, embed_dim=64, num_heads=2,
        attn_l2_norm=attn_l2, patch_nums=PNS, cond_drop_rate=0.0,
        flash_if_available=False, fused_if_available=False,
        drop_path_rate=0.0,
    ).eval()
    from sdvar_tpu.config import VARConfig
    from sdvar_tpu.utils.torch_port import var_params_from_torch

    cfg = VARConfig(
        depth=2, num_classes=10, patch_nums=PNS, vocab_size=64, Cvae=8,
        attn_l2_norm=attn_l2, cond_drop_rate=0.0, drop_path_rate=0.0,
        head_dim=32,
    )
    assert cfg.embed_dim == 64 and cfg.num_heads == 2
    params = var_params_from_torch(cfg, ref_var.state_dict())
    return cfg, ref_var, params


def test_var_train_forward_parity(var_pair):
    cfg, ref_var, params = var_pair
    from sdvar_tpu.models.var import var_train_forward

    rng = np.random.default_rng(4)
    B = 2
    x = rng.standard_normal((B, cfg.L - cfg.first_l, cfg.Cvae)).astype(np.float32)
    label = np.array([3, 7], dtype=np.int64)
    with torch.no_grad():
        ref_logits = ref_var(torch.from_numpy(label), torch.from_numpy(x)).numpy()
    got = np.asarray(
        var_train_forward(cfg, params, label, x)
    )
    np.testing.assert_allclose(ref_logits, got, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def vqvae_pair(ref_models):
    _, _, VQVAE = ref_models
    torch.manual_seed(5)
    ref = VQVAE(vocab_size=64, z_channels=8, ch=32, test_mode=True,
                v_patch_nums=(1, 2)).eval()
    from sdvar_tpu.config import VQVAEConfig
    from sdvar_tpu.utils.torch_port import vqvae_params_from_torch

    cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=(1, 2))
    params = vqvae_params_from_torch(cfg, ref.state_dict())
    return cfg, ref, params


def test_vqvae_encoder_parity(vqvae_pair):
    cfg, ref, params = vqvae_pair
    from sdvar_tpu.models.vqvae import img_to_f

    rng = np.random.default_rng(6)
    img = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_f = ref.quant_conv(ref.encoder(torch.from_numpy(img))).numpy()
    got = np.asarray(img_to_f(cfg, params, img))
    np.testing.assert_allclose(ref_f, got, rtol=2e-4, atol=2e-4)


def test_vqvae_decoder_parity(vqvae_pair):
    cfg, ref, params = vqvae_pair
    from sdvar_tpu.models.vqvae import fhat_to_img

    rng = np.random.default_rng(7)
    f_hat = rng.standard_normal((1, cfg.Cvae, 2, 2)).astype(np.float32)
    with torch.no_grad():
        ref_img = ref.fhat_to_img(torch.from_numpy(f_hat)).numpy()
    got = np.asarray(fhat_to_img(cfg, params, f_hat))
    np.testing.assert_allclose(ref_img, got, rtol=2e-4, atol=2e-4)


def test_sd_masks_match_reference():
    """Our mask builders vs the reference SDVAR precomputed masks
    (models/var.py:548-578) on the full 680-token schedule."""
    from models.var import SDVAR  # reference

    class _Stub(torch.nn.Module):
        pass

    sd = SDVAR.__new__(SDVAR)
    torch.nn.Module.__init__(sd)
    SDVAR.__init__(sd, _Stub(), _Stub())

    from sdvar_tpu.config import PATCH_NUMS_256
    from sdvar_tpu.ops.masks import (
        block_causal_bias,
        block_only_bias,
        sd_masking_bias,
    )

    ref_sd = sd.attn_bias_for_sdmasking[0, 0].numpy()
    ref_blk = sd.attn_bias_for_block[0, 0].numpy()
    np.testing.assert_array_equal(ref_sd, sd_masking_bias(PATCH_NUMS_256))
    np.testing.assert_array_equal(ref_blk, block_only_bias(PATCH_NUMS_256))

    # training mask (models/var.py:106-113): d >= dT
    import numpy as _np

    d = _np.concatenate(
        [_np.full(pn * pn, i) for i, pn in enumerate(PATCH_NUMS_256)]
    )
    ref_causal = _np.where(d[:, None] >= d[None, :], 0.0, -_np.inf)
    np.testing.assert_array_equal(ref_causal, block_causal_bias(PATCH_NUMS_256))
