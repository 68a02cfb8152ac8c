"""Microbench: which int8 matmul formulation hits the v5e int8 MXU path
(394 TOPS, 2x bf16 peak)?

Measured findings (v5e-1, d30 decode GEMM shapes, B=32 CFG-doubled):
  - round 2: bf16 einsum ~171 TFLOP/s (87% of bf16 peak); int8 x int8 ->
    int32 dot_general ~167 (then SLOWER than bf16); convert(int8->bf16)
    both operands + f32 accum ~292 (the int8 MXU path).
  - round 4 (compiler updated): the exact s8 x s8 -> s32 dot now lowers to
    the SAME fast MXU mode — int8_int32 257 vs w8a8 245 TFLOP/s on fc1,
    and w8a8_s8 == w8a8 within noise on every shape. The residual gap
    between int8_int32 (no quantization in the loop) and w8a8/w8a8_s8 is
    pure dynamic-activation-quant overhead: ~0.32 ms per fc2 GEMM at
    scale 9 — the motivation for the fused Pallas act-quant kernel
    (ops/pallas/quantize.py, measured +1.9% decode img/s).
  - W8A8 end-to-end (per-token act quant + fast dot + rescale): 1.2-1.4x
    per-GEMM vs bf16 (quantization costs VPU+HBM, fused by XLA).

Timing methodology: ITERS chained matmuls inside ONE jitted fori_loop with a
scalar data dependency folded back into the carry (defeats DCE/hoisting),
and the result fetched to host (block_until_ready alone returned early
through the axon tunnel for this program shape).

Usage: python tools/microbench_int8_matmul.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")

ITERS = 100


def _pallas_w8a8(x_blc, wq, ws, s8: bool):
    """Fused per-token activation quant + int8 matmul in ONE Pallas kernel.

    s8=True: native s8 x s8 -> s32 dot (does Mosaic hit the 2x MXU mode?).
    s8=False: int8-valued bf16 operands, f32 accum (the XLA-fast pattern).
    Grid (M/bm, N/bn), full K resident per program (K <= 7680 fits VMEM);
    x tile is fetched once per row-block (j innermost revisits it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, K = x_blc.shape
    M = B * L
    N = wq.shape[1]
    x2 = x_blc.reshape(M, K)
    bm = 256
    while M % bm:
        bm //= 2
    bn = 512
    while N % bn:
        bn //= 2

    def kern(x_ref, q_ref, s_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.round(xf / xs)
        if s8:
            acc = jax.lax.dot_general(
                xq.astype(jnp.int8), q_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            acc = jax.lax.dot_general(
                xq.astype(jnp.bfloat16), q_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = (acc * xs * s_ref[0][None, :]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x2, wq, ws.reshape(1, N).astype(jnp.float32))
    return out.reshape(B, L, N)


@functools.partial(jax.jit, static_argnames=("mode",))
def loop(x, wq, ws, w_bf, mode):
    def body(i, x):
        if mode == "bf16":
            y = jnp.einsum("blc,ck->blk", x, w_bf,
                           preferred_element_type=jnp.float32)
        elif mode == "int8_int32":
            xq = x.astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wq, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        elif mode == "w8a8":
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            xs = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            y = acc * xs * ws[None, None, :]
        elif mode == "w8a8_s8":
            # same dynamic per-token quant, but the EXACT s8 x s8 -> s32 dot
            # (isolates the dot formulation from the quantization overhead)
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            xs = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            y = acc * xs * ws[None, None, :]
        elif mode == "pl_s8":
            y = _pallas_w8a8(x, wq, ws, s8=True)
        elif mode == "pl_bf16":
            y = _pallas_w8a8(x, wq, ws, s8=False)
        s = (jnp.mean(y) * 1e-9).astype(x.dtype)
        return x + s[None, None, None]

    return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))


def main():
    key = jax.random.PRNGKey(0)
    B, C = 32, 1920
    for (L, K, N, tag) in [
        (256, C, 4 * C, "fc1 s9"),
        (256, 4 * C, C, "fc2 s9"),
        (256, C, 3 * C, "qkv s9"),
        (192, 4 * C, C, "fc2 s8"),
        (64, C, 4 * C, "fc1 s5"),
        (256, C, 4096, "head s9"),
    ]:
        x = jax.random.normal(key, (B, L, K), jnp.bfloat16)
        wq = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
        ws = jnp.full((N,), 0.01, jnp.float32)
        w_bf = (wq.astype(jnp.float32) * ws[None, :]).astype(jnp.bfloat16)
        fl = 2 * B * L * K * N * ITERS
        row = f"{tag:8s} L={L:4d} K={K:5d} N={N:5d}:"
        for mode in ("bf16", "int8_int32", "w8a8", "w8a8_s8",
                     "pl_s8", "pl_bf16"):
            float(loop(x, wq, ws, w_bf, mode))  # warmup (+ forces fetch)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                float(loop(x, wq, ws, w_bf, mode))
                best = min(best, time.time() - t0)
            row += f"  {mode} {best/ITERS*1e3:6.3f}ms({fl/best/1e12:5.1f}T)"
        print(row, flush=True)


if __name__ == "__main__":
    main()
