"""Pallas TPU fused attention for VAR's scale-structured workloads.

TPU-native replacement for the reference's CUDA attention stack
(flash-attn / xformers memory_efficient_attention / SDPA —
reference: models/basic_var.py:14-30,97-117): one kernel serves training
(block-causal bias), KV-cached decode (bias-free, small queries), handoff
prefill and speculative verify (additive scale-block masks).

Why a custom kernel: a plain einsum-softmax-einsum materializes the
(B, H, Lq, Lk) score tensor in HBM (at d30 scale-9 that is hundreds of MB of
round-trip traffic per layer). VAR sequences are short (L <= 680 at 256px,
2240 at 1024px), so an entire (q, k, v) triple for one (batch, head) pair
fits VMEM — no online-softmax streaming needed; one fused program computes
scores + softmax + PV without leaving VMEM.

Grid: (batch, heads). Each program handles one head of one batch row:
  q (Lq, d), k/v (Lk, d), optional bias (Lq, Lk) shared across the grid.
The f32 score tile peaks at 680x680x4B = 1.85 MB — well under the 16 MB VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0]  # (Lq, d)
    k = k_ref[0]  # (Lk, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias_ref[...].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    # guard fully-masked rows (all -inf): max is -inf -> exp(nan); clamp
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_nobias(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def pallas_attention(
    q: jnp.ndarray,           # (B, Lq, H, d)
    k: jnp.ndarray,           # (B, Lk, H, d)
    v: jnp.ndarray,           # (B, Lk, H, d)
    bias: Optional[jnp.ndarray] = None,  # (Lq, Lk) additive, or None
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Lq, H, d = q.shape
    Lk = k.shape[1]
    qT = q.transpose(0, 2, 1, 3).reshape(B * H, Lq, d)
    kT = k.transpose(0, 2, 1, 3).reshape(B * H, Lk, d)
    vT = v.transpose(0, 2, 1, 3).reshape(B * H, Lk, d)

    grid = (B * H,)
    qspec = pl.BlockSpec((1, Lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Lq * Lk * d,
        bytes_accessed=(Lq * d + 2 * Lk * d + Lq * d) * 2,
        transcendentals=Lq * Lk,
    )
    if bias is not None:
        bspec = pl.BlockSpec((Lq, Lk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel_bias, scale=scale),
            grid=grid,
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B * H, Lq, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qT, kT, vT, bias.astype(jnp.float32))
    else:
        out = pl.pallas_call(
            functools.partial(_attn_kernel_nobias, scale=scale),
            grid=grid,
            in_specs=[qspec, kspec, kspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B * H, Lq, d), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qT, kT, vT)
    return out.reshape(B, H, Lq, d).transpose(0, 2, 1, 3)
