"""VQVAE: conv encoder/decoder around the multi-scale residual quantizer.

Capability parity with the reference ``VQVAE`` (reference: models/vqvae.py:16-95)
and its Stable-Diffusion-style CNN backbone (reference: models/basic_vae.py):
GroupNorm(32) + swish ResNet blocks, non-local self-attention at the lowest
resolution and in the mid block, strided-conv downsampling with (0,1,0,1)
padding, nearest-neighbour x2 upsampling + conv.

TPU-first notes: pure functions over a params pytree, NCHW layout with OIHW
kernels (torch checkpoint-compatible), f32 throughout (the tokenizer is the
numerics-critical path; its cost is negligible next to the transformer).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import VQVAEConfig
from sdvar_tpu.models import quantizer as Q

Params = Dict
HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding=((1, 1), (1, 1))) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=HI,
    )
    return y + p["b"][None, :, None, None]


def group_norm(p: Params, x: jnp.ndarray, groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    B, C, H, W = x.shape
    # statistics always in f32: free on the f32 golden path, and keeps the
    # bf16 serving decode (fhat_to_img_bf16) within 8-bit pixel resolution
    # of it (bf16 mean/var over H*W elements loses ~3 decimal digits)
    xg = x.reshape(B, groups, C // groups, H, W).astype(jnp.float32)
    mu = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    xg = ((xg - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    x = xg.reshape(B, C, H, W)
    return x * p["g"][None, :, None, None] + p["b"][None, :, None, None]


def swish(x):
    return x * jax.nn.sigmoid(x)


def resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """reference: models/basic_vae.py:40-60."""
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x, padding=((0, 0), (0, 0)))
    return x + h


def attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Non-local single-head self-attention (reference:
    models/basic_vae.py:63-92)."""
    B, C, H, W = x.shape
    qkv = conv2d(p["qkv"], group_norm(p["norm"], x), padding=((0, 0), (0, 0)))
    q, k, v = jnp.split(qkv, 3, axis=1)  # each (B, C, H, W)
    q = q.reshape(B, C, H * W).transpose(0, 2, 1)  # B, HW, C
    k = k.reshape(B, C, H * W)
    w = jax.nn.softmax(
        jnp.einsum("bnc,bcm->bnm", q, k, precision=HI) * (C ** -0.5), axis=2
    )
    v = v.reshape(B, C, H * W)
    h = jnp.einsum("bcm,bnm->bcn", v, w, precision=HI).reshape(B, C, H, W)
    return x + conv2d(p["proj_out"], h, padding=((0, 0), (0, 0)))


def downsample2x(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pad right/bottom by 1 then 3x3 stride-2 conv (reference:
    models/basic_vae.py:31-37)."""
    return conv2d(p, x, stride=2, padding=((0, 1), (0, 1)))


def upsample2x(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 then conv (reference: models/basic_vae.py:22-28)."""
    B, C, H, W = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return conv2d(p, x)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encoder_forward(cfg: VQVAEConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, H, W) in [-1, 1] -> (B, Cvae, H/16, W/16)
    (reference: models/basic_vae.py:144-160)."""
    nres = len(cfg.ch_mult)
    h = conv2d(p["conv_in"], x)
    for i, level in enumerate(p["down"]):
        for j in range(cfg.num_res_blocks):
            h = resnet_block(level["block"][j], h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if i != nres - 1:
            h = downsample2x(level["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    return conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))


def decoder_forward(cfg: VQVAEConfig, p: Params, z: jnp.ndarray) -> jnp.ndarray:
    """(B, Cvae, h, w) -> (B, 3, 16h, 16w) (reference:
    models/basic_vae.py:210-226)."""
    nres = len(cfg.ch_mult)
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i in reversed(range(nres)):
        level = p["up"][i]
        for j in range(cfg.num_res_blocks + 1):
            h = resnet_block(level["block"][j], h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if i != 0:
            h = upsample2x(level["upsample"], h)
    return conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))


# ---------------------------------------------------------------------------
# channels-last (NHWC) decoder path — the serving/FID fast pixel decode
# ---------------------------------------------------------------------------
#
# The NCHW layout above is checkpoint-golden but maps poorly onto the TPU
# conv units: XLA inserts layout transposes around nearly every 3x3 conv
# (channels must land on the lane dimension), and the measured bf16 decoder
# ran at ~12% of peak (111 ms per B=16 batch — BENCHMARKS.md pixel-decoder
# cost). The NHWC path runs the SAME weights with channels last end-to-end:
# kernels are transposed OIHW->HWIO on the fly (a few MB, fused into the
# first use), GroupNorm reduces over (H, W, C/G) contiguously, and the x2
# nearest upsample is a broadcast-reshape. Numerics: identical math modulo
# f32/bf16 summation order inside the convs (XLA picks a different
# contraction layout), bounded by tests/test_serving.py against the NCHW
# golden path.

# trace-time switches for the W8A8 decoder paths (set only by
# fhat_to_img_nhwc_w8a8 / calibrate_decoder_w8a8; the eligible-site ORDER is
# the contract between them — one deterministic decoder trace)
_NHWC_W8A8 = False
_W8A8_CALIB = None   # collect mode: list appended with (per-Cin amax, w, b)
_W8A8_SITES = None   # apply mode: iterator over pre-quantized site dicts


def conv2d_nhwc(p: Params, x: jnp.ndarray, stride: int = 1,
                padding=((1, 1), (1, 1))) -> jnp.ndarray:
    if _NHWC_W8A8 and stride == 1 and p["w"].shape[2:] == (3, 3) \
            and padding == ((1, 1), (1, 1)):
        from sdvar_tpu.ops.pallas import conv_s8 as CS8
        from sdvar_tpu.ops.partition import pallas_interpret, tp_mesh_active

        if CS8.eligible(x.shape) and not tp_mesh_active() and (
                jax.default_backend() in ("tpu", "axon") or pallas_interpret()):
            if _W8A8_CALIB is not None:
                # record this site's per-input-channel activation amax (+ its
                # params, concrete here: calibration closes over them) and
                # fall through to the clean bf16 conv
                _W8A8_CALIB.append((
                    jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2)),
                    p["w"], p["b"], x.shape,
                ))
            elif _W8A8_SITES is not None:
                # static calibrated per-channel scales, pre-quantized
                # weights; None = site excluded from quantization (e.g.
                # below the min_w FLOPs cut) -> clean bf16 conv below
                site = next(_W8A8_SITES)
                if site is not None:
                    return CS8.conv3x3_s8_static(site, x,
                                                 interpret=pallas_interpret())
            else:
                return CS8.conv2d_nhwc_w8a8(p, x, interpret=pallas_interpret())
    w = jnp.transpose(p["w"], (2, 3, 1, 0)).astype(x.dtype)  # OIHW -> HWIO
    # precision comes from the ambient jax.default_matmul_precision scope
    # set by fhat_to_img_nhwc (bf16: native; f32: highest or bfloat16_3x)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def group_norm_nhwc(p: Params, x: jnp.ndarray, groups: int = 32,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Channels-last GroupNorm with token-axis VPU statistics.

    160 ch / 32 groups = 5 lanes per group: a reshape-to-groups reduction is
    pathological in NHWC (the lane dimension collapses to 5). Round 4 first
    shipped an MXU segment-sum matmul against a 0/1 group-membership matrix;
    this simpler form reduces over the TOKEN axis instead (lane-contiguous
    in NHWC) to per-channel sums (B, C), then folds to per-group (B, G) in a
    trivially small op. Measured identical to the matmul form end-to-end
    (98.2 ms decoder both ways, B=16) — GN stats are a negligible share of
    the decoder (ablation puts ~80% of device time in the 3x3 convs,
    BENCHMARKS.md round-4 pixel profile) — kept for simplicity. Stats stay
    f32 regardless of the ambient matmul precision scope (the bf16 path
    sets default_matmul_precision=bfloat16 for the convs)."""
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C).astype(jnp.float32)
    s1c = jnp.sum(xf, axis=1)               # (B, C) per-channel sums
    s2c = jnp.sum(xf * xf, axis=1)          # (B, C) sums of squares
    cpg = C // groups
    s1 = s1c.reshape(B, groups, cpg).sum(-1)    # (B, G)
    s2 = s2c.reshape(B, groups, cpg).sum(-1)
    cnt = H * W * cpg
    mu_g = s1 / cnt                              # (B, G)
    var_g = s2 / cnt - mu_g * mu_g
    # broadcast group stats back to channels: (B, G) -> (B, 1, 1, C)
    mu_c = jnp.repeat(mu_g, cpg, axis=1)[:, None, None, :]
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), cpg,
                        axis=1)[:, None, None, :]
    xn = ((x.reshape(B, H, W, C).astype(jnp.float32) - mu_c)
          * rstd_c).astype(x.dtype)
    return xn * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


def resnet_block_nhwc(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d_nhwc(p["conv1"], swish(group_norm_nhwc(p["norm1"], x)))
    h = conv2d_nhwc(p["conv2"], swish(group_norm_nhwc(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d_nhwc(p["nin_shortcut"], x, padding=((0, 0), (0, 0)))
    return x + h


def attn_block_nhwc(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    qkv = conv2d_nhwc(p["qkv"], group_norm_nhwc(p["norm"], x),
                      padding=((0, 0), (0, 0)))
    q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * C), 3, axis=2)
    w = jax.nn.softmax(
        jnp.einsum("bnc,bmc->bnm", q, k) * (C ** -0.5), axis=2)
    h = jnp.einsum("bnm,bmc->bnc", w, v)
    return x + conv2d_nhwc(p["proj_out"], h.reshape(B, H, W, C),
                           padding=((0, 0), (0, 0)))


def upsample2x_nhwc(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return conv2d_nhwc(p, x.reshape(B, 2 * H, 2 * W, C))


def downsample2x_nhwc(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return conv2d_nhwc(p, x, stride=2, padding=((0, 1), (0, 1)))


def encoder_forward_nhwc(cfg: VQVAEConfig, p: Params,
                         x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/16, W/16, Cvae); same program as
    ``encoder_forward`` in channels-last layout (see the NHWC block
    comment above)."""
    nres = len(cfg.ch_mult)
    h = conv2d_nhwc(p["conv_in"], x)
    for i, level in enumerate(p["down"]):
        for j in range(cfg.num_res_blocks):
            h = resnet_block_nhwc(level["block"][j], h)
            if level["attn"]:
                h = attn_block_nhwc(level["attn"][j], h)
        if i != nres - 1:
            h = downsample2x_nhwc(level["downsample"], h)
    h = resnet_block_nhwc(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block_nhwc(p["mid"]["attn_1"], h)
    h = resnet_block_nhwc(p["mid"]["block_2"], h)
    return conv2d_nhwc(p["conv_out"], swish(group_norm_nhwc(p["norm_out"], h)))


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "precision"))
def img_to_f_nhwc(cfg: VQVAEConfig, p: Params, img: jnp.ndarray,
                  dtype=jnp.bfloat16,
                  precision: str = "highest") -> jnp.ndarray:
    """Channels-last tokenizer encoder (NCHW image in, NCHW f32 latent
    out); the fast-path sibling of ``img_to_f``/``img_to_f_bf16``. Same
    precision semantics as fhat_to_img_nhwc."""
    prec = ("bfloat16" if dtype == jnp.bfloat16
            else {"highest": "float32", "high": "BF16_BF16_F32_X3"}[precision])
    with jax.default_matmul_precision(prec):
        x = img.transpose(0, 2, 3, 1).astype(dtype)
        f = encoder_forward_nhwc(cfg, p["encoder"], x)
        f = conv2d_nhwc(p["quant_conv"], f)
        return f.transpose(0, 3, 1, 2).astype(jnp.float32)


def img_to_idxBl_nhwc(cfg: VQVAEConfig, p: Params, img: jnp.ndarray,
                      patch_nums=None, dtype=jnp.bfloat16) -> List[jnp.ndarray]:
    """Fast-path tokenize: NHWC encoder (bf16 by default) + the standard
    f32/HIGHEST residual quantizer pyramid."""
    return Q.encode(cfg, p["quant"], img_to_f_nhwc(cfg, p, img, dtype=dtype),
                    patch_nums=patch_nums)


def decoder_forward_nhwc(cfg: VQVAEConfig, p: Params,
                         z: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, Cvae) -> (B, 16h, 16w, 3); same program as
    ``decoder_forward`` in channels-last layout."""
    nres = len(cfg.ch_mult)
    h = conv2d_nhwc(p["conv_in"], z)
    h = resnet_block_nhwc(p["mid"]["block_1"], h)
    if cfg.using_mid_sa:
        h = attn_block_nhwc(p["mid"]["attn_1"], h)
    h = resnet_block_nhwc(p["mid"]["block_2"], h)
    for i in reversed(range(nres)):
        level = p["up"][i]
        for j in range(cfg.num_res_blocks + 1):
            h = resnet_block_nhwc(level["block"][j], h)
            if level["attn"]:
                h = attn_block_nhwc(level["attn"][j], h)
        if i != 0:
            h = upsample2x_nhwc(level["upsample"], h)
    return conv2d_nhwc(p["conv_out"], swish(group_norm_nhwc(p["norm_out"], h)))


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "precision"))
def fhat_to_img_nhwc(cfg: VQVAEConfig, p: Params, f_hat: jnp.ndarray,
                     dtype=jnp.bfloat16,
                     precision: str = "highest") -> jnp.ndarray:
    """Fast pixel decode: channels-last end-to-end, bf16 (serving) or f32.
    Input f_hat is NCHW (decode-engine layout); output is NCHW [-1, 1] like
    ``fhat_to_img``. See the NHWC block comment above for why this exists.

    ``precision`` (f32 input only): "highest" = 6-pass bf16 emulation
    (matches the golden path's conv numerics class); "high" = 3-pass
    bfloat16_3x (~2x faster convs, relative error ~1e-6 — still far inside
    FID insensitivity; measured deltas in tools/bench_pixels.py)."""
    prec = ("bfloat16" if dtype == jnp.bfloat16
            else {"highest": "float32", "high": "BF16_BF16_F32_X3"}[precision])
    with jax.default_matmul_precision(prec):
        z = f_hat.transpose(0, 2, 3, 1).astype(dtype)
        z = conv2d_nhwc(p["post_quant_conv"], z)
        img = decoder_forward_nhwc(cfg, p["decoder"], z)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
        return img.transpose(0, 3, 1, 2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fhat_to_img_nhwc_w8a8(cfg: VQVAEConfig, p: Params,
                          f_hat: jnp.ndarray) -> jnp.ndarray:
    """EXPERIMENTAL W8A8 pixel decode: the NHWC decoder with its big 3x3
    convs on the int8 MXU path (ops/pallas/conv_s8.py implicit-GEMM
    kernel; per-Cout weight + per-tensor dynamic activation scales).
    Measured 97.9 -> 90.2 ms per B=16 batch but mean |pixel delta| vs the
    f32 golden decoder grows 0.0063 -> 0.035 at the random-weight worst
    case — NOT the serving default (fhat_to_img_nhwc is); see the kernel
    module docstring for the full investigation."""
    global _NHWC_W8A8
    prev = _NHWC_W8A8  # restore (not force-False) so interleaved traces
    _NHWC_W8A8 = True  # of this function stay reentrant
    try:
        with jax.default_matmul_precision("bfloat16"):
            z = f_hat.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
            z = conv2d_nhwc(p["post_quant_conv"], z)
            img = decoder_forward_nhwc(cfg, p["decoder"], z)
            img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
            return img.transpose(0, 3, 1, 2)
    finally:
        _NHWC_W8A8 = prev


def calibrate_decoder_w8a8(cfg: VQVAEConfig, p: Params, f_hats,
                           headroom: float = 1.0, alpha: float = 0.65,
                           min_w: int = 0):
    """Static per-channel W8A8 calibration of the NHWC pixel decoder
    (round-4 VERDICT Weak #1 fix): run the bf16 decoder over calibration
    ``f_hats`` batches, record each eligible 3x3 conv's per-INPUT-channel
    activation amax, fold those channel scales into the weights, and
    pre-quantize per-Cout. Returns a tuple of site dicts for
    ``fhat_to_img_nhwc_w8a8(..., sites=...)``, in decoder call order.

    Per-channel folding keeps the integer kernel unchanged:
      y_o = sum_c (x_c / s_c) * (w_oc * s_c)  — activations quantized on a
    per-channel grid, the fold absorbed at weight-quantization time
    (reference decoder being quantized: models/basic_vae.py:163-226).
    """
    from sdvar_tpu.ops.pallas.conv_s8 import quantize_site

    global _NHWC_W8A8, _W8A8_CALIB
    sink, weights = [], []

    @jax.jit
    def run(f_hat):  # p in closure: site params stay CONCRETE during trace
        global _NHWC_W8A8, _W8A8_CALIB
        prev_flag, prev_sink = _NHWC_W8A8, _W8A8_CALIB
        _NHWC_W8A8, _W8A8_CALIB = True, []
        try:
            with jax.default_matmul_precision("bfloat16"):
                z = f_hat.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
                z = conv2d_nhwc(p["post_quant_conv"], z)
                decoder_forward_nhwc(cfg, p["decoder"], z)
            amaxes = [a for a, _, _, _ in _W8A8_CALIB]
            if not weights:
                weights.extend((np.asarray(w), np.asarray(b), shp)
                               for _, w, b, shp in _W8A8_CALIB)
            return amaxes
        finally:
            _NHWC_W8A8, _W8A8_CALIB = prev_flag, prev_sink

    if not isinstance(f_hats, (list, tuple)):
        f_hats = [f_hats]
    for fh in f_hats:
        sink.append([np.asarray(a) for a in run(jnp.asarray(fh))])
    amax = [np.max(np.stack(col), axis=0) for col in zip(*sink)]
    assert len(amax) == len(weights), (len(amax), len(weights))
    # min_w: quantize only sites at spatial width >= min_w (None = site
    # stays bf16). Conv FLOPs scale with (W*C)^2 and the top level carries
    # ~half of them, so a high cut keeps most of the int8 win while
    # removing most of the 29-site error compounding.
    return tuple(None if shp[2] < min_w
                 else quantize_site(w, b, a, headroom=headroom, alpha=alpha)
                 for (w, b, shp), a in zip(weights, amax))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fhat_to_img_nhwc_w8a8_static(cfg: VQVAEConfig, p: Params,
                                  f_hat: jnp.ndarray, sites) -> jnp.ndarray:
    global _NHWC_W8A8, _W8A8_SITES
    prev_flag, prev_sites = _NHWC_W8A8, _W8A8_SITES
    _NHWC_W8A8, _W8A8_SITES = True, iter(sites)
    try:
        with jax.default_matmul_precision("bfloat16"):
            z = f_hat.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
            z = conv2d_nhwc(p["post_quant_conv"], z)
            img = decoder_forward_nhwc(cfg, p["decoder"], z)
            img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
            return img.transpose(0, 3, 1, 2)
    finally:
        _NHWC_W8A8, _W8A8_SITES = prev_flag, prev_sites


def fhat_to_img_nhwc_w8a8_static(cfg: VQVAEConfig, p: Params,
                                 f_hat: jnp.ndarray, sites) -> jnp.ndarray:
    """Calibrated W8A8 pixel decode: like ``fhat_to_img_nhwc_w8a8`` but with
    STATIC per-channel activation scales and pre-quantized weights from
    ``calibrate_decoder_w8a8`` (no in-graph weight quantization)."""
    return _fhat_to_img_nhwc_w8a8_static(cfg, p, f_hat, tuple(sites))


# ---------------------------------------------------------------------------
# public VQVAE API (reference: models/vqvae.py:56-90)
# ---------------------------------------------------------------------------

def img_to_f(cfg: VQVAEConfig, p: Params, img: jnp.ndarray) -> jnp.ndarray:
    f = encoder_forward(cfg, p["encoder"], img.astype(jnp.float32))
    return conv2d(p["quant_conv"], f)


def img_to_idxBl(cfg: VQVAEConfig, p: Params, img: jnp.ndarray,
                 patch_nums=None) -> List[jnp.ndarray]:
    return Q.encode(cfg, p["quant"], img_to_f(cfg, p, img),
                    patch_nums=patch_nums)


def img_to_f_bf16(cfg: VQVAEConfig, p: Params, img: jnp.ndarray) -> jnp.ndarray:
    """Training-path tokenizer encoder in bf16 (GroupNorm stats stay f32),
    mirroring ``fhat_to_img_bf16``: the frozen-VQVAE tokenize is HALF of a
    d16 train step in f32-HIGHEST (574 of 1118 ms at B=32 — BENCHMARKS.md
    training table); bf16 convs run at the MXU's native rate. The residual
    quantizer pyramid downstream stays f32/HIGHEST — only encoder conv
    rounding can flip a token, and only where the top-2 codebook distances
    are already within bf16 noise. Golden-parity surfaces keep
    ``img_to_f``; opt in via TrainConfig.tokenize_bf16."""

    def cast(a):
        return a.astype(jnp.bfloat16) if jnp.issubdtype(
            a.dtype, jnp.floating) else a

    pc = jax.tree.map(cast, {"encoder": p["encoder"],
                             "quant_conv": p["quant_conv"]})
    f = encoder_forward(cfg, pc["encoder"], img.astype(jnp.bfloat16))
    return conv2d(pc["quant_conv"], f).astype(jnp.float32)


def img_to_idxBl_bf16(cfg: VQVAEConfig, p: Params, img: jnp.ndarray,
                      patch_nums=None) -> List[jnp.ndarray]:
    return Q.encode(cfg, p["quant"], img_to_f_bf16(cfg, p, img),
                    patch_nums=patch_nums)


def fhat_to_img(cfg: VQVAEConfig, p: Params, f_hat: jnp.ndarray) -> jnp.ndarray:
    """f_hat -> image in [-1, 1] (reference: models/vqvae.py:62-63)."""
    z = conv2d(p["post_quant_conv"], f_hat.astype(jnp.float32))
    return jnp.clip(decoder_forward(cfg, p["decoder"], z), -1.0, 1.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fhat_to_img_bf16(cfg: VQVAEConfig, p: Params,
                     f_hat: jnp.ndarray) -> jnp.ndarray:
    """Serving-path pixel decode: the same CNN in bf16 on the MXU's native
    rate instead of f32 HIGHEST (6-pass) — ~2x faster, and the dominant
    cost of an end-to-end request once the latent decode is quantized
    (tools/bench_serving.py). Golden-parity surfaces (tests, FID protocol)
    keep f32 ``fhat_to_img``; bf16-vs-f32 pixel delta is bounded by
    tests/test_serving.py."""

    def cast(a):
        return a.astype(jnp.bfloat16) if jnp.issubdtype(
            a.dtype, jnp.floating) else a

    pc = jax.tree.map(cast, {"post_quant_conv": p["post_quant_conv"],
                             "decoder": p["decoder"]})
    z = conv2d(pc["post_quant_conv"], f_hat.astype(jnp.bfloat16))
    img = decoder_forward(cfg, pc["decoder"], z)
    return jnp.clip(img.astype(jnp.float32), -1.0, 1.0)


def img_to_reconstructed_img(cfg: VQVAEConfig, p: Params,
                             img: jnp.ndarray) -> jnp.ndarray:
    fhats = Q.encode(cfg, p["quant"], img_to_f(cfg, p, img), return_fhat=True)
    return fhat_to_img(cfg, p, fhats[-1])


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, cin, cout, ks) -> Params:
    fan_in = cin * ks * ks
    lim = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cout, cin, ks, ks), minval=-lim, maxval=lim),
        "b": jax.random.uniform(kb, (cout,), minval=-lim, maxval=lim),
    }


def _gn_init(c) -> Params:
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _res_init(key, cin, cout) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin), "conv1": _conv_init(k1, cin, cout, 3),
        "norm2": _gn_init(cout), "conv2": _conv_init(k2, cout, cout, 3),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, cin, cout, 1)
    return p


def _attn_init(key, c) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": _gn_init(c),
        "qkv": _conv_init(k1, c, 3 * c, 1),
        "proj_out": _conv_init(k2, c, c, 1),
    }


def init_vqvae_params(cfg: VQVAEConfig, key: jax.Array) -> Params:
    ch, zc = cfg.ch, cfg.z_channels
    nres = len(cfg.ch_mult)
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    # encoder
    in_mult = (1,) + tuple(cfg.ch_mult)
    enc_down = []
    for i in range(nres):
        cin, cout = ch * in_mult[i], ch * cfg.ch_mult[i]
        blocks, attns = [], []
        c = cin
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_init(nk(), c, cout))
            c = cout
            if i == nres - 1 and cfg.using_sa:
                attns.append(_attn_init(nk(), c))
        lvl = {"block": blocks, "attn": attns}
        if i != nres - 1:
            lvl["downsample"] = _conv_init(nk(), c, c, 3)
        enc_down.append(lvl)
    cmid = ch * cfg.ch_mult[-1]
    encoder = {
        "conv_in": _conv_init(nk(), 3, ch, 3),
        "down": enc_down,
        "mid": {
            "block_1": _res_init(nk(), cmid, cmid),
            "attn_1": _attn_init(nk(), cmid),
            "block_2": _res_init(nk(), cmid, cmid),
        },
        "norm_out": _gn_init(cmid),
        "conv_out": _conv_init(nk(), cmid, zc, 3),
    }

    # decoder
    dec_up: List[Optional[Params]] = [None] * nres
    c = cmid
    for i in reversed(range(nres)):
        cout = ch * cfg.ch_mult[i]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_res_init(nk(), c, cout))
            c = cout
            if i == nres - 1 and cfg.using_sa:
                attns.append(_attn_init(nk(), c))
        lvl = {"block": blocks, "attn": attns}
        if i != 0:
            lvl["upsample"] = _conv_init(nk(), c, c, 3)
        dec_up[i] = lvl
    decoder = {
        "conv_in": _conv_init(nk(), zc, cmid, 3),
        "mid": {
            "block_1": _res_init(nk(), cmid, cmid),
            "attn_1": _attn_init(nk(), cmid),
            "block_2": _res_init(nk(), cmid, cmid),
        },
        "up": dec_up,
        "norm_out": _gn_init(ch * cfg.ch_mult[0]),
        "conv_out": _conv_init(nk(), ch * cfg.ch_mult[0], 3, 3),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv_init(nk(), zc, zc, cfg.quant_conv_ks),
        "post_quant_conv": _conv_init(nk(), zc, zc, cfg.quant_conv_ks),
        "quant": Q.init_quantizer_params(cfg, nk()),
    }
