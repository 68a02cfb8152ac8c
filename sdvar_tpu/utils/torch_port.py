"""Convert reference PyTorch checkpoints (VAR / VQVAE state_dicts) into
sdvar_tpu param pytrees.

This is the weight-porting path for the published model zoo
(vae_ch160v4096z32.pth, var_d{16,20,24,30}.pth — reference README.md:84-94)
and the oracle bridge for golden parity tests (a randomly-initialized
reference module's state_dict round-trips into our pytree and both forwards
must agree).

Torch ``nn.Linear`` stores weight as (out, in); we store (in, out) so the
forward is ``x @ w + b`` — every linear weight is transposed here, convs stay
OIHW.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdvar_tpu.config import VARConfig, VQVAEConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def var_params_from_torch(cfg: VARConfig, sd: Dict) -> Dict:
    """Map a reference VAR state_dict (models/var.py:22-117) to our pytree."""
    sd = {k: _np(v) for k, v in sd.items()}
    depth = cfg.depth

    def stack(fmt: str, transpose=False):
        arrs = [sd[fmt.format(i)] for i in range(depth)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs).astype(np.float32)

    blocks = {
        "qkv_w": stack("blocks.{}.attn.mat_qkv.weight", transpose=True),
        "q_bias": stack("blocks.{}.attn.q_bias"),
        "v_bias": stack("blocks.{}.attn.v_bias"),
        "proj_w": stack("blocks.{}.attn.proj.weight", transpose=True),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
        "fc1_w": stack("blocks.{}.ffn.fc1.weight", transpose=True),
        "fc1_b": stack("blocks.{}.ffn.fc1.bias"),
        "fc2_w": stack("blocks.{}.ffn.fc2.weight", transpose=True),
        "fc2_b": stack("blocks.{}.ffn.fc2.bias"),
    }
    if cfg.attn_l2_norm:
        blocks["scale_mul"] = stack("blocks.{}.attn.scale_mul_1H11").reshape(
            depth, cfg.num_heads
        )
    if cfg.shared_aln:
        blocks["ada_gss"] = stack("blocks.{}.ada_gss").reshape(
            depth, 1, 6, cfg.embed_dim
        )
    else:
        blocks["ada_lin_w"] = stack("blocks.{}.ada_lin.1.weight", transpose=True)
        blocks["ada_lin_b"] = stack("blocks.{}.ada_lin.1.bias")

    params = {
        "word_embed": {
            "w": sd["word_embed.weight"].T.astype(np.float32),
            "b": sd["word_embed.bias"].astype(np.float32),
        },
        "class_emb": sd["class_emb.weight"].astype(np.float32),
        "pos_start": sd["pos_start"].reshape(cfg.first_l, cfg.embed_dim).astype(np.float32),
        "pos_1LC": sd["pos_1LC"].reshape(cfg.L, cfg.embed_dim).astype(np.float32),
        "lvl_embed": sd["lvl_embed.weight"].astype(np.float32),
        "blocks": blocks,
        "head_nm": {
            "w": sd["head_nm.ada_lin.1.weight"].T.astype(np.float32),
            "b": sd["head_nm.ada_lin.1.bias"].astype(np.float32),
        },
        "head": {
            "w": sd["head.weight"].T.astype(np.float32),
            "b": sd["head.bias"].astype(np.float32),
        },
    }
    if cfg.shared_aln:
        params["shared_ada_lin"] = {
            "w": sd["shared_ada_lin.1.weight"].T.astype(np.float32),
            "b": sd["shared_ada_lin.1.bias"].astype(np.float32),
        }
    return params


def quantizer_params_from_torch(cfg: VQVAEConfig, sd: Dict,
                                prefix: str = "quantize.") -> Dict:
    """Map VectorQuantizer2 weights (models/quant.py:15-46,199-243)."""
    sd = {k: _np(v) for k, v in sd.items()}
    K = cfg.num_phi
    if cfg.share_quant_resi == 1:
        names = [f"{prefix}quant_resi.qresi."] * 1
    elif cfg.share_quant_resi == 0:
        names = [f"{prefix}quant_resi.{k}." for k in range(K)]
    else:
        names = [f"{prefix}quant_resi.qresi_ls.{k}." for k in range(K)]
    phi_w = np.stack([sd[n + "weight"] for n in names]).astype(np.float32)
    phi_b = np.stack([sd[n + "bias"] for n in names]).astype(np.float32)
    return {
        "codebook": sd[f"{prefix}embedding.weight"].astype(np.float32),
        "phi_w": phi_w,
        "phi_b": phi_b,
    }


def _conv(sd, name):
    return {"w": sd[name + ".weight"].astype(np.float32),
            "b": sd[name + ".bias"].astype(np.float32)}


def _gn(sd, name):
    return {"g": sd[name + ".weight"].astype(np.float32),
            "b": sd[name + ".bias"].astype(np.float32)}


def _res(sd, name):
    p = {
        "norm1": _gn(sd, name + ".norm1"), "conv1": _conv(sd, name + ".conv1"),
        "norm2": _gn(sd, name + ".norm2"), "conv2": _conv(sd, name + ".conv2"),
    }
    if name + ".nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, name + ".nin_shortcut")
    return p


def _attn(sd, name):
    return {
        "norm": _gn(sd, name + ".norm"),
        "qkv": _conv(sd, name + ".qkv"),
        "proj_out": _conv(sd, name + ".proj_out"),
    }


def vqvae_params_from_torch(cfg: VQVAEConfig, sd: Dict) -> Dict:
    """Map a full reference VQVAE state_dict (models/vqvae.py,
    models/basic_vae.py) to our pytree."""
    sd = {k: _np(v) for k, v in sd.items()}
    nres = len(cfg.ch_mult)

    down = []
    for i in range(nres):
        pre = f"encoder.down.{i}"
        blocks = [_res(sd, f"{pre}.block.{j}") for j in range(cfg.num_res_blocks)]
        attns = []
        if i == nres - 1 and cfg.using_sa:
            attns = [
                _attn(sd, f"{pre}.attn.{j}") for j in range(cfg.num_res_blocks)
            ]
        lvl = {"block": blocks, "attn": attns}
        if f"{pre}.downsample.conv.weight" in sd:
            lvl["downsample"] = _conv(sd, f"{pre}.downsample.conv")
        down.append(lvl)
    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "down": down,
        "mid": {
            "block_1": _res(sd, "encoder.mid.block_1"),
            "attn_1": _attn(sd, "encoder.mid.attn_1"),
            "block_2": _res(sd, "encoder.mid.block_2"),
        },
        "norm_out": _gn(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }

    up = [None] * nres
    for i in range(nres):
        pre = f"decoder.up.{i}"
        blocks = [
            _res(sd, f"{pre}.block.{j}") for j in range(cfg.num_res_blocks + 1)
        ]
        attns = []
        if i == nres - 1 and cfg.using_sa:
            attns = [
                _attn(sd, f"{pre}.attn.{j}")
                for j in range(cfg.num_res_blocks + 1)
            ]
        lvl = {"block": blocks, "attn": attns}
        if f"{pre}.upsample.conv.weight" in sd:
            lvl["upsample"] = _conv(sd, f"{pre}.upsample.conv")
        up[i] = lvl
    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "block_1": _res(sd, "decoder.mid.block_1"),
            "attn_1": _attn(sd, "decoder.mid.attn_1"),
            "block_2": _res(sd, "decoder.mid.block_2"),
        },
        "up": up,
        "norm_out": _gn(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quant": quantizer_params_from_torch(cfg, sd),
    }
