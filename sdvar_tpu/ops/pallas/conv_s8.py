"""Pallas TPU implicit-GEMM 3x3 conv, INT8 x INT8 -> INT32 (experimental).

Round-4 investigation of the NHWC pixel decoder (tools/bench_pixels.py;
VERDICT round-3 item 2 follow-up). Ground truth established by ablation
inside the real decoder program (fresh-process wall times, B=16 256px):

  - full bf16 decoder          98.9 ms wall (~73 ms device + ~25 ms axon
                               dispatch floor — mind the floor when reading
                               per-call pixel numbers)
  - GN statistics ablated      98.5 ms  -> GroupNorm stats are NEGLIGIBLE
  - 3x3 convs -> 1x1 (1/9 fl)  40.0 ms  -> the 3x3 convs are ~80% of
                               device time (16 ms device remains)

The convs run at ~43% of bf16 peak (5.65 ms for the 483-GFLOP 256^2
160-channel conv) because both GEMM dims pad 160 -> 256 lanes
((160/256)^2 = 39% MXU tile utilization). This kernel restores utilization
by folding the 3 VERTICAL taps into the contraction (K = 3C = 480 -> 512,
94%) — vertical because row offsets live on an untiled dim (Mosaic rejects
DMA slices and concats offset on the tiled W/C dims, and bf16 rotates are
"not implemented") — and building the +-1-pixel HORIZONTAL taps with
pair/quad-packed 32-bit `pltpu.roll` plus byte shifts in the lanes.

Measured (one v5e chip, marginal cost inside one jit, d=16 256^2 160ch):

  | formulation                   | ms/conv | TFLOP/s |
  |-------------------------------|---------|---------|
  | XLA bf16 conv                 | 5.65    | 86      |
  | this kernel, bf16 operands    | 5.71    | 85      | (parity: the VPU
  |                               |         |         |  tap assembly eats
  |                               |         |         |  the K-fold gain)
  | this kernel, s8 x s8 -> s32   | 2.8-3.4 | 144-170 | (2x MXU int8 rate)

End-to-end W8A8 decoder (per-Cout weight scales + per-TENSOR dynamic
activation scale — per-PIXEL scales cannot factor out of an im2col GEMM
row, which spans 9 pixels): 97.9 -> 90.2 ms wall, but pixel error vs the
f32 golden decoder grows 0.0063 -> 0.0354 mean |delta| in [-1, 1]
(random-weight worst case) — the post-GN+swish activations use too little
of the per-tensor int8 grid. NOT wired into the serving path: -8% wall is
not worth 5.6x the pixel error. Kept under test as the validated building
block for a future fused GN+swish+quant+conv kernel (which would also
remove the XLA-side quantization passes) or for trained checkpoints whose
activation ranges prove tighter.

The exact integer math is bit-faithful: outputs differ from a dequantized
f32-HIGHEST XLA conv only by the final bf16 cast (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prev_ref, cur_ref, nxt_ref, w_ref, b_ref, s_ref, o_ref,
            *, bh, W, C, O):
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    prev = prev_ref[0]
    cur = cur_ref[0]
    nxt = nxt_ref[0]
    # vertical taps from the 3 pipelined row-blocks; row-dim concat offsets
    # are legal (untiled dim)
    tap0 = jnp.concatenate([prev[bh - 1:bh], cur[0:bh - 1]], axis=0)
    tap2 = jnp.concatenate([cur[1:bh], nxt[0:1]], axis=0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (bh, W, C), 0)
    tap0 = jnp.where(jnp.logical_and(r == 0, rowi == 0), 0, tap0)
    tap2 = jnp.where(jnp.logical_and(r == nr - 1, rowi == bh - 1), 0, tap2)

    # vcat[w] = [x[row-1, w], x[row, w], x[row+1, w]]   (bh, W, 3C) int8
    vcat = jnp.concatenate([tap0, cur, tap2], axis=-1)
    # horizontal +-1-pixel shifts: int8 bitcasts pack 4 W-adjacent values
    # per u32 (sublane packing), so shift = quad-granular roll + byte
    # shifts recombining adjacent lanes (low byte = lowest W index)
    v32 = pltpu.bitcast(vcat, jnp.uint32)            # (bh, W/4, 3C)
    n4 = v32.shape[1]
    b32 = pltpu.roll(v32, 1, 1)                      # b_j = a_{j-1}
    c32 = pltpu.roll(v32, n4 - 1, 1)                 # c_j = a_{j+1}
    l32 = (b32 >> 24) | (v32 << 8)
    r32 = (v32 >> 8) | (c32 << 24)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (bh, W, 3 * C), 1)
    left = jnp.where(wcol >= 1, pltpu.bitcast(l32, jnp.int8), 0)
    right = jnp.where(wcol < W - 1, pltpu.bitcast(r32, jnp.int8), 0)

    acc = jnp.zeros((bh * W, O), jnp.int32)
    for dx, h in ((0, left), (1, vcat), (2, right)):
        acc = acc + jax.lax.dot_general(
            h.reshape(bh * W, 3 * C), w_ref[dx],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s_ref[0][None, :] + b_ref[0][None, :]
    o_ref[...] = out.reshape(1, bh, W, O).astype(o_ref.dtype)


def eligible(shape, stride=1) -> bool:
    """3x3 stride-1 'same' convs the kernel lowers for."""
    B, H, W, C = shape
    return (stride == 1 and H % 8 == 0 and H >= 8 and W % 4 == 0
            and C % 4 == 0 and W >= 32)


@functools.partial(jax.jit, static_argnames=("bh", "interpret", "out_dtype"))
def conv3x3_s8(x8, w8, scale, bias, bh=8, interpret=False,
               out_dtype=jnp.bfloat16):
    """NHWC 3x3 stride-1 pad-1 conv on the int8 MXU path.

    x8:    (B, H, W, C) int8 quantized activations
    w8:    (3, 3, C, O) int8 HWIO quantized weights
    scale: (O,) f32 — combined dequant scale (weight-channel scale x
           activation scale); the integer accumulator is multiplied by it
    bias:  (O,) f32
    Returns (B, H, W, O) ``out_dtype``.
    """
    B, H, W, C = x8.shape
    O = w8.shape[-1]
    assert w8.shape[:2] == (3, 3), w8.shape  # kernel is specialised to 3x3
    assert eligible(x8.shape), x8.shape
    assert H % bh == 0, (H, bh)
    w3 = w8.transpose(1, 0, 2, 3).reshape(3, 3 * C, O)  # dx-major, dy in K
    blk = lambda: pl.BlockSpec((1, bh, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM)
    nr = H // bh
    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=W, C=C, O=O),
        grid=(B, nr),
        in_specs=[
            pl.BlockSpec((1, bh, W, C),
                         lambda b, r: (b, jnp.maximum(r - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            blk(),
            pl.BlockSpec((1, bh, W, C),
                         lambda b, r: (b, jnp.minimum(r + 1, nr - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * C, O), lambda b, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, W, O), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * O,
            bytes_accessed=B * H * W * (3 * C + 2 * O),
            transcendentals=0),
        interpret=interpret,
    )(x8, x8, x8, w3, bias.reshape(1, O).astype(jnp.float32),
      scale.reshape(1, O).astype(jnp.float32))


def quantize_site(w, b, act_amax, headroom: float = 1.0,
                  alpha: float = 0.65):
    """Pre-quantize one conv site with STATIC per-input-channel activation
    scales (from calibration) folded into the weights:

      y_o = sum_c (x_c / s_c) * (w_oc * s_c)

    w: (O, C, 3, 3) OIHW f32;  act_amax: (C,) calibrated |x| maxima.
    ``alpha`` interpolates the channel scale between per-tensor (0) and
    fully per-channel (1), SmoothQuant-style: folding s_c into the weights
    skews the per-Cout weight grid, so the best operating point balances
    activation-grid vs folded-weight-grid error (measured optimum ~0.65-
    0.75, ~2x lower error than per-tensor on skewed channels — tests).
    Since s_c >= amax_c for alpha <= 1, activations never clip.
    Host-side numpy — runs once, off the serving hot path."""
    import numpy as np

    amax = np.maximum(np.asarray(act_amax, np.float32), 1e-12)
    eff = amax ** alpha * float(amax.max()) ** (1.0 - alpha)
    act_s = np.maximum(eff / 127.0 * headroom, 1e-12)
    wh = np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))  # HWIO
    wfold = wh * act_s[None, None, :, None]
    ws = np.maximum(np.max(np.abs(wfold), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(wfold / ws[None, None, None, :]), -127, 127)
    return {
        "wq": jnp.asarray(wq.astype(np.int8)),
        "scale": jnp.asarray(ws),                      # act scale is folded
        "bias": jnp.asarray(np.asarray(b, np.float32)),
        "act_inv": jnp.asarray(1.0 / act_s),           # x -> int8 multiplier
    }


def conv3x3_s8_static(site, x, interpret=False):
    """Apply a calibrated site: per-channel static activation quant (clip to
    the int8 grid — outliers beyond the calibrated amax saturate) + the
    exact s8 kernel with pre-quantized folded weights."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * site["act_inv"]),
                  -127, 127).astype(jnp.int8)
    return conv3x3_s8(xq, site["wq"], site["scale"], site["bias"],
                      interpret=interpret, out_dtype=x.dtype)


def conv2d_nhwc_w8a8(p, x, interpret=False):
    """Drop-in W8A8 wrapper for an eligible ``conv2d_nhwc`` call: per-Cout
    weight scales, per-tensor dynamic activation scale, exact s8 dot.
    See the module docstring for the measured quality trade-off."""
    w = p["w"]  # OIHW
    wh = jnp.transpose(w, (2, 3, 1, 0)).astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wh), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.round(wh / ws).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.round(xf / xs).astype(jnp.int8)
    return conv3x3_s8(xq, wq, ws * xs, p["b"].astype(jnp.float32),
                      interpret=interpret, out_dtype=x.dtype)
