"""PyTorch-parity separable image resizing as dense matmuls.

The reference's quantizer hot path leans on ``F.interpolate`` with
``mode='bicubic'`` (upsampling token maps to 16x16, reference:
models/quant.py:83,117,160,180,190) and ``mode='area'`` (downsampling the
residual / f_hat to the next scale, reference: models/quant.py:68,150,183,192).
Token ids diverge scale-by-scale if these don't match PyTorch bit-for-bit-ish
(SURVEY.md "Hard parts": resize-op parity).

TPU-first design: since every (in_size, out_size) pair is static and tiny
(<= 64), we precompute the exact interpolation weights as a dense
(out x in) matrix with numpy and apply the 2-D resize as two matmuls over the
trailing spatial dims. This is numerically identical to PyTorch's kernels
(same cubic convolution, A = -0.75, half-pixel source mapping, border
replication; same adaptive-average-pool integer bins for 'area') and maps
straight onto the MXU instead of gather/scatter lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bicubic_resize",
    "area_resize",
    "bicubic_weight_matrix",
    "area_weight_matrix",
]


def _cubic_conv1(x: np.ndarray, A: float) -> np.ndarray:
    # |x| <= 1 branch of the cubic convolution kernel (Keys 1981), A = -0.75.
    return ((A + 2) * x - (A + 3)) * x * x + 1


def _cubic_conv2(x: np.ndarray, A: float) -> np.ndarray:
    # 1 < |x| < 2 branch.
    return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A


@functools.lru_cache(maxsize=None)
def bicubic_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix W with out = W @ in.

    Matches ``torch.nn.functional.interpolate(mode='bicubic',
    align_corners=False, antialias=False)`` along one axis: half-pixel source
    coordinates, 4-tap cubic convolution with A=-0.75, and index clamping at
    the borders (torch's ``upsample_get_value_bounded``).
    """
    A = -0.75
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        t = src - base
        w = np.array(
            [
                _cubic_conv2(t + 1.0, A),
                _cubic_conv1(t, A),
                _cubic_conv1(1.0 - t, A),
                _cubic_conv2(2.0 - t, A),
            ]
        )
        for tap in range(4):
            j = min(max(base - 1 + tap, 0), in_size - 1)
            W[i, j] += w[tap]
    return W


@functools.lru_cache(maxsize=None)
def area_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) matrix matching
    ``F.interpolate(mode='area')`` == ``adaptive_avg_pool`` along one axis:
    output bin i averages input cells [floor(i*n/m), ceil((i+1)*n/m))."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        W[i, start:end] = 1.0 / (end - start)
    return W


def _apply_separable(x: jnp.ndarray, Wh: np.ndarray, Ww: np.ndarray) -> jnp.ndarray:
    """Apply per-axis weight matrices over the trailing two dims of x.

    x: (..., H, W) -> (..., H_out, W_out). Two MXU matmuls; accumulate in f32.
    """
    dt = x.dtype
    Wh_ = jnp.asarray(Wh, dtype=jnp.float32)
    Ww_ = jnp.asarray(Ww, dtype=jnp.float32)
    # HIGHEST precision: these feed the argmin codebook lookup — bf16 MXU
    # passes would flip token ids near decision boundaries.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("...hw,vw->...hv", x.astype(jnp.float32), Ww_,
                   precision=hi, preferred_element_type=jnp.float32)
    y = jnp.einsum("uh,...hv->...uv", Wh_, y,
                   precision=hi, preferred_element_type=jnp.float32)
    return y.astype(dt)


def bicubic_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize of (..., H, W) to (..., out_h, out_w), torch-parity."""
    H, W = x.shape[-2], x.shape[-1]
    return _apply_separable(
        x, bicubic_weight_matrix(H, out_hw[0]), bicubic_weight_matrix(W, out_hw[1])
    )


def area_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Area (adaptive-average) resize of (..., H, W), torch-parity."""
    H, W = x.shape[-2], x.shape[-1]
    return _apply_separable(
        x, area_weight_matrix(H, out_hw[0]), area_weight_matrix(W, out_hw[1])
    )
