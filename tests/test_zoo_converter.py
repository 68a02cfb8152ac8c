"""Checkpoint-converter drill across the full model-zoo config matrix
(VERDICT round-3 item 7).

Real zoo checkpoints cannot be downloaded here (zero egress), so each zoo
config's EXACT reference key set is synthesized the only non-circular way
available: by instantiating the REFERENCE VAR class itself (torch CPU) with
that config's architecture flags — depth, shared_aln (d36-s), attn_l2_norm
(zoo default True, models/__init__.py:22), patch_nums preset — at reduced
width (head_dim 16 instead of 64; key sets and shape FORMULAS are
width-invariant). Each state_dict then round-trips through
utils/torch_port.var_params_from_torch + the convert_checkpoint CLI's
save/load core, and the ported params must reproduce the reference
forward's logits. d30-re shares d30's architecture (same keys/shapes —
README.md:93 is a re-trained checkpoint), so depth 30 covers both.

Zoo matrix source: /root/reference/README.md:84-94,
models/__init__.py:16-46 (heads=depth, width=depth*64, attn_l2_norm=True),
utils/arg_util.py:244-249 (512px patch_nums preset).
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

from sdvar_tpu.config import (  # noqa: E402
    PATCH_NUMS_256,
    PATCH_NUMS_512,
    VARConfig,
)

HEAD_DIM = 16  # reduced width: zoo is 64; keys/shape formulas identical
V, CVAE = 512, 16

# (zoo name, depth, shared_aln, patch_nums)
ZOO = [
    ("var_d16", 16, False, PATCH_NUMS_256),
    ("var_d20", 20, False, PATCH_NUMS_256),
    ("var_d24", 24, False, PATCH_NUMS_256),
    ("var_d30", 30, False, PATCH_NUMS_256),   # d30-re: same architecture
    ("var_d36_512", 36, True, PATCH_NUMS_512),  # shared AdaLN (README.md:94)
]


@pytest.fixture(scope="module")
def ref_classes():
    from models.var import VAR
    from models.vqvae import VQVAE

    return VAR, VQVAE


@pytest.mark.parametrize("name,depth,shared_aln,pns",
                         ZOO, ids=[z[0] for z in ZOO])
def test_zoo_config_roundtrip_and_forward(ref_classes, tmp_path, name,
                                          depth, shared_aln, pns):
    VAR, VQVAE = ref_classes
    torch.manual_seed(depth)
    vae = VQVAE(vocab_size=V, z_channels=CVAE, ch=32, test_mode=True,
                v_patch_nums=pns)
    ref_var = VAR(
        vae_local=vae, num_classes=1000, depth=depth,
        embed_dim=depth * HEAD_DIM, num_heads=depth,
        shared_aln=shared_aln, attn_l2_norm=True, patch_nums=pns,
        cond_drop_rate=0.0, drop_path_rate=0.0,
        flash_if_available=False, fused_if_available=False,
    ).eval()
    with torch.no_grad():  # ctor head is ~0; randomize for real parity
        ref_var.head.weight.normal_(0, 0.05)
        ref_var.head.bias.normal_(0, 0.05)

    sd = ref_var.state_dict()
    cfg = VARConfig(depth=depth, num_classes=1000, patch_nums=pns,
                    vocab_size=V, Cvae=CVAE, head_dim=HEAD_DIM,
                    shared_aln=shared_aln, attn_l2_norm=True,
                    cond_drop_rate=0.0, drop_path_rate=0.0)

    from sdvar_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from sdvar_tpu.utils.torch_port import var_params_from_torch

    params = var_params_from_torch(cfg, sd)

    # the convert_checkpoint CLI core: save -> load, leaf-exact
    out = str(tmp_path / name)
    save_checkpoint(out, 0, params, meta={"kind": "var", "depth": depth})
    loaded, meta = load_checkpoint(os.path.join(out, "ckpt-00000000"),
                                   params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # forward parity: any mis-mapped/missing/misshapen tensor shows here
    rng = np.random.default_rng(depth)
    B = 1
    x = rng.standard_normal(
        (B, cfg.L - cfg.first_l, cfg.Cvae)).astype(np.float32)
    label = np.array([depth % 1000], dtype=np.int64)
    with torch.no_grad():
        ref_logits = ref_var(torch.from_numpy(label),
                             torch.from_numpy(x)).numpy()
    from sdvar_tpu.models.var import var_train_forward

    got = np.asarray(var_train_forward(cfg, loaded, label, x))
    assert got.shape == ref_logits.shape == (B, cfg.L, V)
    np.testing.assert_allclose(ref_logits, got, rtol=3e-4, atol=3e-4)


import jax  # noqa: E402  (used in the test body)
