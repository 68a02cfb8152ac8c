"""Pallas TPU fused activation quantization: bias + GELU + per-token INT8
in ONE pass over the activation.

Why this exists (round 4): the W8A8 decode's remaining per-scale slack is
the dynamic activation quantization itself. XLA runs it as extra passes
over the activation around each GEMM — for the fc2 input (the 4C GELU
output, the largest activation in the model) that is an amax read pass plus
a round/div read+write pass on top of the GELU epilogue, ~0.32 ms per
scale-9 GEMM at d30 B=16 (tools/microbench_int8_matmul.py: w8a8 1.60 ms vs
1.28 ms for the same dot fed pre-quantized rows). This kernel reads the fc1
matmul output once, applies bias + tanh-GELU in f32, computes the per-token
amax with the row resident in VMEM, and writes int8 values + f32 scales —
one read + a half-size write, no extra passes.

Measured (d30 B=16 W8A8+INT8-KV decode, one v5e chip): 385.8 -> 378.4
ms/batch (41.5 -> 42.3 img/s) with the kernel on the two largest scales
(MIN_FUSED_ROWS gate below); the naive everywhere-on variant measured
391 ms — the small scales' per-call overhead exceeds their saving.

It became profitable only this round: the exact s8 x s8 -> s32 dot_general
now lowers to the same fast int8 MXU mode as the convert(int8->bf16) form
(measured 242 vs 245 TFLOP/s on the fc1 shape; in round 2 the exact form
was 167), so the consumer (ops/quantization.w8a8_prequant_matmul) can take
real int8 rows without losing the 2x MXU rate.

Numerics: GELU is computed in f32 (the XLA path computes it in the
activation dtype, bf16 on the decode path) and the dot accumulates in exact
int32 — both deltas are within the W8A8 quantization noise bounded by
tests/test_quantization.py and the mid-size oracle agreement tests.

No VJP: inference-only (training runs bf16 — reference has no quantized
training either).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, b_ref, q_ref, s_ref, *, gelu: bool):
    h = x_ref[...].astype(jnp.float32) + b_ref[0][None, :]
    if gelu:
        # tanh GELU, matching jax.nn.gelu(approximate=True)
        # (reference: models/basic_var.py:40 uses nn.GELU(approximate='tanh'))
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654
                                      * (h + 0.044715 * h * h * h)))
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q_ref[...] = jnp.round(h / s).astype(jnp.int8)
    s_ref[...] = s


def _pick_bm(m: int, k: int) -> Optional[int]:
    """Largest divisor of m that keeps the working set (~10 bytes/elem:
    double-buffered bf16 in + f32 compute + double-buffered int8 out)
    inside the scoped-VMEM budget. None -> caller falls back to XLA."""
    budget_rows = max(8, (11_000_000 // (10 * k)) // 8 * 8)
    b = min(256, budget_rows, m)
    while b >= 8:
        if m % b == 0:
            return b
        b -= 8 if b % 8 == 0 else b % 8
    return None


@functools.partial(jax.jit, static_argnames=("gelu", "interpret"))
def act_quantize(
    x: jnp.ndarray,                    # (B, L, K) bf16/f32
    bias: Optional[jnp.ndarray] = None,  # (K,) f32 (added before GELU)
    gelu: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L, K) -> (int8 (B, L, K), f32 (B, L, 1) per-token scales).

    Semantics match ``quantize_activation(gelu(x + bias))`` with the GELU
    in f32. Caller is responsible for shape gating (use ``eligible``).
    """
    B, L, K = x.shape
    M = B * L
    bm = _pick_bm(M, K)
    assert bm is not None, (x.shape, "caller must gate on eligible()")
    b = (jnp.zeros((K,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    q, s = pl.pallas_call(
        functools.partial(_kernel, gelu=gelu),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * K,
            bytes_accessed=M * K * x.dtype.itemsize + M * K + M * 4,
            transcendentals=M * K if gelu else 0,
        ),
        interpret=interpret,
    )(x.reshape(M, K), b.reshape(1, K))
    return q.reshape(B, L, K), s.reshape(B, L, 1)


# Row-count gate for the decode FFN: below this the per-call overhead of
# the kernel exceeds the saved XLA quantization passes. Round-4 sweep (d30
# B=16 W8A8+INT8-KV decode): >=4096 (pn 13, 16) = 378.4 ms best. Round-5
# re-sweep on the CURRENT compiler (tools/retest_negatives.py): 2048 ->
# 41.85 img/s, 3200 -> 41.72, 4096 -> 41.56, never -> 41.63 — ordering
# flipped within ~0.7% tunnel noise; default follows the measured best.
MIN_FUSED_ROWS = 2048
# compiler-dependent threshold: re-measured each round via
# tools/retest_negatives.py (env override, read once at import)
import os as _os  # noqa: E402

MIN_FUSED_ROWS = int(_os.environ.get("SDVAR_MIN_FUSED_ROWS",
                                     MIN_FUSED_ROWS))


def eligible(x: jnp.ndarray, min_rows: int = 0) -> bool:
    """Shapes the kernel lowers for: lane-aligned K, sublane-divisible M.
    ``min_rows`` additionally applies the profitability gate."""
    B, L, K = x.shape
    return (B * L >= min_rows and K % 128 == 0
            and _pick_bm(B * L, K) is not None)
