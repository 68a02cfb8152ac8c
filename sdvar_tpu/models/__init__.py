"""Model factories (capability parity with reference models/__init__.py:16-97).

``build_vae_var`` returns (configs, params) for one VQVAE + one VAR;
``build_vae_var_speculative_decoding`` returns a draft/target pair sharing a
single tokenizer (codebook and VAE weights are NOT duplicated — reference
models/__init__.py:68,96 and SURVEY.md hard-parts list).
"""

from __future__ import annotations

from typing import Tuple

import jax

from sdvar_tpu.config import PATCH_NUMS_256, VARConfig, VQVAEConfig
from sdvar_tpu.models import quantizer, var, vqvae  # noqa: F401
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params


def build_vae_var(
    key: jax.Array,
    patch_nums=PATCH_NUMS_256,
    V: int = 4096, Cvae: int = 32, ch: int = 160, share_quant_resi: int = 4,
    num_classes: int = 1000, depth: int = 16,
    shared_aln: bool = False, attn_l2_norm: bool = True,
):
    vae_cfg = VQVAEConfig(
        vocab_size=V, z_channels=Cvae, ch=ch,
        share_quant_resi=share_quant_resi, patch_nums=tuple(patch_nums),
    )
    var_cfg = VARConfig(
        depth=depth, num_classes=num_classes, patch_nums=tuple(patch_nums),
        vocab_size=V, Cvae=Cvae, shared_aln=shared_aln,
        attn_l2_norm=attn_l2_norm,
    )
    k1, k2 = jax.random.split(key)
    vae_params = init_vqvae_params(vae_cfg, k1)
    var_params = init_var_params(var_cfg, k2)
    return (vae_cfg, var_cfg), (vae_params, var_params)


def build_vae_var_speculative_decoding(
    key: jax.Array,
    patch_nums=PATCH_NUMS_256,
    V: int = 4096, Cvae: int = 32, ch: int = 160, share_quant_resi: int = 4,
    num_classes: int = 1000, depth_draft: int = 16, depth_target: int = 30,
    shared_aln: bool = False, attn_l2_norm: bool = True,
):
    vae_cfg = VQVAEConfig(
        vocab_size=V, z_channels=Cvae, ch=ch,
        share_quant_resi=share_quant_resi, patch_nums=tuple(patch_nums),
    )
    mk = dict(
        num_classes=num_classes, patch_nums=tuple(patch_nums), vocab_size=V,
        Cvae=Cvae, shared_aln=shared_aln, attn_l2_norm=attn_l2_norm,
    )
    draft_cfg = VARConfig(depth=depth_draft, **mk)
    target_cfg = VARConfig(depth=depth_target, **mk)
    k1, k2, k3 = jax.random.split(key, 3)
    vae_params = init_vqvae_params(vae_cfg, k1)
    draft_params = init_var_params(draft_cfg, k2)
    target_params = init_var_params(target_cfg, k3)
    return (
        (vae_cfg, draft_cfg, target_cfg),
        (vae_params, draft_params, target_params),
    )
