"""Pallas TPU fused attention for VAR's scale-structured workloads.

TPU-native replacement for the reference's CUDA attention stack
(flash-attn / xformers memory_efficient_attention / SDPA —
reference: models/basic_var.py:14-30,97-117): one kernel serves training
(block-causal bias), KV-cached decode (bias-free, small queries), handoff
prefill and speculative verify (additive scale-block masks).

Why a custom kernel: XLA's attention materializes the (B, H, Lq, Lk) f32
score tensor in HBM (at d30 scale 9 that is ~670 MB of round-trip traffic
per layer) and lays out q/k/v with batch minor, which forces full KV-cache
layout copies at scale boundaries. VAR sequences are short (L <= 680 at
256px, 2240 at 1024px), so whole (q, k, v) slices fit VMEM — no
online-softmax streaming needed; one fused program computes scores +
softmax + PV without leaving VMEM.

v2 design (v1 did one (batch, head) pair per program on transposed
(B*H, L, d) inputs — the four HBM layout transforms around the kernel cost
more than the fusion saved):
  - inputs stay in the model's native merged-head layout: q (B, Lq, H*hd),
    k/v (B, Lk, H*hd) or TOKEN-MAJOR (Lk, B, H*hd) exactly as the KV cache
    stores them (models/var.KVCache) — ZERO transposes around the kernel;
  - grid (B, H / hpp) with hpp = 128 // hd heads per program, so every
    VMEM block is 128-lane aligned (a trailing dim of hd=64 would waste
    half of every lane tile);
  - scores/softmax in f32 registers/VMEM only; PV accumulates f32 on the
    MXU (preferred_element_type).

Training runs through a custom_vjp whose backward is the plain XLA
einsum composition — forward pass gets the fused kernel, gradients get
XLA's (already well-fused) backward, and nothing needs a handwritten
transposed kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, hpp, hd, tm,
            bias_ref=None):
    """One program: ``hpp`` heads of one batch row, merged-head blocks.

    q_ref: (1, Lq, hpp*hd); k_ref/v_ref: (1, Lk, hpp*hd), or token-major 2-D
    (Lk, hpp*hd) lane-blocks of the (Lk, B*C) cache view when ``tm``;
    bias_ref: (Lq, Lk) f32 or None; o_ref: (1, Lq, hpp*hd).
    """
    q = q_ref[0]
    k = k_ref[...] if tm else k_ref[0]
    v = v_ref[...] if tm else v_ref[0]
    outs = []
    for j in range(hpp):
        sl = slice(j * hd, (j + 1) * hd)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias_ref is not None:
            s = s + bias_ref[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        # guard fully-masked rows (all -inf): exp(-inf - -inf) = nan
        m = jnp.maximum(m, -1e30)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _xla_attention(q, k, v, bias, scale, tm=False):
    """Reference composition — also the VJP backward path."""
    kidx = "kbhd" if tm else "bkhd"
    logits = jnp.einsum(f"bqhd,{kidx}->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[None, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(f"bhqk,{kidx}->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pallas_forward(q, k, v, bias, scale: float, interpret: bool, tm: bool):
    B, Lq, H, hd = q.shape
    Lk = k.shape[0] if tm else k.shape[1]
    # heads per program: largest h <= 8 dividing H whose merged lane block
    # (h*hd) is 128-aligned — fewer, fatter programs amortize grid overhead
    # (hpp=6 vs 2 at d30: 160 vs 480 programs).
    hpp = 1
    for h in range(2, 9):
        if H % h == 0 and (h * hd) % 128 == 0:
            hpp = h
    C = H * hd
    blk = hpp * hd
    # Block the query axis so the per-head f32 score tile (blkq, Lk) stays
    # well under the ~16 MB scoped-VMEM budget (at 512px Lq=1024/Lk=2240 an
    # unblocked tile is 9.2 MB and the kernel stack OOMs). Largest divisor
    # of Lq that keeps the tile <= 4 MB, capped at 256.
    blkq = Lq
    if Lq * Lk * 4 > 4 * 1024 * 1024 or Lq > 256:
        best = 8
        for d in range(8, min(Lq, 256) + 1, 8):
            if Lq % d == 0 and d * Lk * 4 <= 4 * 1024 * 1024:
                best = d
        blkq = best
        if Lq % blkq:
            return _xla_attention(q, k, v, bias, scale, tm)
    nq = Lq // blkq
    qm = q.reshape(B, Lq, C)
    if tm:
        # token-major cache slices: view (Lk, B, C) as 2-D (Lk, B*C) and
        # hand each program its (Lk, blk) lane window — TPU block rules
        # need the last-two dims (div 8 | full, div 128), which a
        # (Lk, 1, blk) 3-D block violates at the B axis.
        km = k.reshape(Lk, B * C)
        vm = v.reshape(Lk, B * C)
        lanes_per_b = C // blk
        kspec = pl.BlockSpec((Lk, blk),
                             lambda b, h, i: (0, b * lanes_per_b + h),
                             memory_space=pltpu.VMEM)
    else:
        km = k.reshape(B, Lk, C)
        vm = v.reshape(B, Lk, C)
        kspec = pl.BlockSpec((1, Lk, blk), lambda b, h, i: (b, 0, h),
                             memory_space=pltpu.VMEM)

    grid = (B, H // hpp, nq)
    qspec = pl.BlockSpec((1, blkq, blk), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, blkq, blk), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * B * H * Lq * Lk * hd,
        bytes_accessed=2 * (B * Lq * C + 2 * B * Lk * C),
        transcendentals=B * H * Lq * Lk,
    )
    kw = dict(scale=scale, hpp=hpp, hd=hd, tm=tm)
    if bias is not None:
        bspec = pl.BlockSpec((blkq, Lk), lambda b, h, i: (i, 0),
                             memory_space=pltpu.VMEM)

        def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, o_ref, bias_ref=b_ref, **kw)

        out = pl.pallas_call(
            _kernel_bias,
            grid=grid,
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qm, km, vm, bias.astype(jnp.float32))
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, **kw),
            grid=grid,
            in_specs=[qspec, kspec, kspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qm, km, vm)
    return out.reshape(B, Lq, H, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_vjp(q, k, v, bias, scale, interpret, tm):
    return _pallas_forward(q, k, v, bias, scale, interpret, tm)


def _attention_fwd(q, k, v, bias, scale, interpret, tm):
    return _pallas_forward(q, k, v, bias, scale, interpret, tm), (q, k, v, bias)


def _attention_bwd(scale, interpret, tm, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v, b: _xla_attention(q, k, v, b, scale, tm),
                     q, k, v, bias)
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db


_attention_vjp.defvjp(_attention_fwd, _attention_bwd)


def pallas_attention(
    q: jnp.ndarray,           # (B, Lq, H, d)
    k: jnp.ndarray,           # (B, Lk, H, d) or (Lk, B, H, d) token-major
    v: jnp.ndarray,           # same layout as k
    bias: Optional[jnp.ndarray] = None,  # (Lq, Lk) additive, or None
    scale: float = 1.0,
    interpret: bool = False,
    kv_token_major: bool = False,
) -> jnp.ndarray:
    # NOT jit-wrapped: a nested jit inside the caller's scan body is a call
    # boundary that forces canonical input/output layouts — measured as four
    # extra per-layer HBM copies around the kernel (profile_decode).
    return _attention_vjp(q, k, v, bias, scale, interpret, kv_token_major)
