"""Pallas TPU fused INT8-weight matmul: dequantize in VMEM, feed the MXU.

The XLA path for weight-only INT8 (ops/quantization.py resolve_weight)
materializes the dequantized bf16 matrix in HBM before the matmul — a full
extra write+read of every weight, which is why INT8 measured *neutral* on
decode throughput (BENCHMARKS.md). This kernel streams the int8 blocks into
VMEM (half the HBM bytes of bf16), converts to bf16 in registers, and
multiplies — the dequant never touches HBM.

Scheme parity with ops/quantization.py: symmetric per-output-channel int8,
w ≈ q * s with q int8 (K, N), s f32 (N,). y = (x @ q) * s.

Grid (M/bm, N/bn, K/bk) with a VMEM f32 accumulator scratch; K innermost
("arbitrary" semantics) so each output block accumulates across K chunks
without leaving VMEM.

Weight-only inference kernel: no VJP (training runs bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = q_ref[...].astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[0][None, :]).astype(o_ref.dtype)


def _pick_block(n: int, pref: int, align: int = 128) -> int:
    """Largest divisor of n that is <= pref, preferring ``align``-multiples
    (lane tiles) so VMEM blocks aren't padded."""
    best = None
    b = min(pref, n)
    while b >= 1:
        if n % b == 0:
            if b % align == 0:
                return b
            if best is None:
                best = b
        b -= 1
    return best or n


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def int8_matmul(
    x: jnp.ndarray,      # (M, K) bf16/f32
    q: jnp.ndarray,      # (K, N) int8
    s: jnp.ndarray,      # (N,) f32 per-output-channel scales
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    M, K = x.shape
    K2, N = q.shape
    assert K == K2, (x.shape, q.shape)
    out_dtype = out_dtype or x.dtype

    bm = _pick_block(M, 256, align=8)
    bn = _pick_block(N, 512)
    bk = _pick_block(K, 1024)
    nk = K // bk
    grid = (M // bm, N // bn, nk)
    cost = pl.CostEstimate(
        flops=2 * M * K * N,
        bytes_accessed=(M * K * x.dtype.itemsize + K * N
                        + M * N * jnp.dtype(out_dtype).itemsize),
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, q, s.reshape(1, N).astype(jnp.float32))
    return out


def int8_matmul_blc(x_blc: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                    interpret: bool = False, out_dtype=None) -> jnp.ndarray:
    """(B, L, K) @ int8 (K, N) -> (B, L, N); flattens tokens into M."""
    B, L, K = x_blc.shape
    y = int8_matmul(x_blc.reshape(B * L, K), q, s, interpret=interpret,
                    out_dtype=out_dtype)
    return y.reshape(B, L, -1)
