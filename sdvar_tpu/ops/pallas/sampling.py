"""Pallas TPU fused top-k / top-p / Gumbel-max sampling kernel.

TPU-native replacement for the sort-based sampling path (reference
semantics: models/helpers.py:6-19). The XLA fast path costs a full
``lax.top_k`` sort over the vocab per token (~22 ms of a 487 ms d30 decode,
profile_decode). This kernel never sorts: both filters are pure VALUE
thresholds, and thresholds can be found by bisection with the row resident
in VMEM:

  - top-k mask keeps x >= v_k (the kth largest value, ties included —
    exactly torch's ``logits < topk(k).values[-1] -> -inf`` rule);
  - the nucleus rule keeps x_j iff the softmax mass STRICTLY GREATER than
    x_j is < p (torch's sorted-prefix rule for distinct values; ties at the
    boundary are all kept, where torch keeps a positional subset — a
    measure-zero event for continuous logits);
  - both v_k and the nucleus threshold are found EXACTLY by 32-step integer
    bisection on the monotone int32 image of the float bit pattern
    (sign-magnitude -> biased int), counting / mass-summing per step —
    O(V) VMEM traffic per step instead of a sort network.

Sampling then draws Gumbel noise from the per-core PRNG and takes a masked
argmax. The Gumbel stream differs from ``jax.random.gumbel`` (same
distribution, different bits), so the kernel is opt-in for bitwise-repro
workflows; masks are bit-exact vs the XLA path and tested as such.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _to_ordered_i32(x):
    """Monotone map f32 -> int32 (ordered): keep positives' bit pattern,
    flip negatives' magnitude bits. int32 (not uint32) because Mosaic has
    no unsigned reductions. NaN-free inputs assumed."""
    i = pltpu.bitcast(x, jnp.int32)
    return jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))


def _mid(lo, hi):
    """Overflow-safe signed floor average (the bisection midpoint)."""
    return (lo & hi) + ((lo ^ hi) >> 1)


def _i32(c: int) -> jnp.ndarray:
    """uint32 literal as a wrapped int32 constant."""
    import numpy as np

    return jnp.int32(np.uint32(c).astype(np.int32))


def _lshr(x, n: int):
    """Logical right shift on int32 (Mosaic has no unsigned ops):
    arithmetic shift then mask off the sign-extended high bits."""
    return (x >> n) & jnp.int32((1 << (32 - n)) - 1)


def _rowhash_bits(row_seeds, bm: int, V: int) -> jnp.ndarray:
    """Counter-based per-row random bits: murmur3 finalizer over
    (row_seed, column). Fully vectorized — every batch row draws an
    independent, position-independent noise stream, so a request's sample
    depends only on its own key (serving determinism), not on which batch
    slot the scheduler placed it in."""
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, V), 1)
    h = row_seeds + col * _i32(0x9E3779B9)
    h = h ^ _lshr(h, 16)
    h = h * _i32(0x85EBCA6B)
    h = h ^ _lshr(h, 13)
    h = h * _i32(0xC2B2AE35)
    h = h ^ _lshr(h, 16)
    return h


def _kernel(x_ref, seed_ref, out_ref, mask_ref, *, top_k, top_p, V,
            with_noise, noise_ref=None, row_seed_ref=None):
    """One block: (bm, V) logits -> (bm, 1) sampled ids (+ debug mask).

    mask_ref: int8 (bm, V) debug output of the final keep mask (compiled
    out of the hot path would need a second pallas_call signature; the
    write is cheap and keeps one code path).
    """
    x = x_ref[...].astype(jnp.float32)          # (bm, V)
    u = _to_ordered_i32(x)                       # ordered int32 image

    # ---- top-k threshold: largest t with count(u >= t) >= k, by integer
    # bisection. Invariant: count(>= lo) >= k, count(>= hi) < k.
    def bisect_count(_, lohi):
        lo, hi = lohi
        mid = _mid(lo, hi)
        cnt = jnp.sum((u >= mid[:, None]).astype(jnp.int32), axis=-1,
                      keepdims=False)
        ge = cnt >= top_k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    bm = x.shape[0]
    lo0 = jnp.full((bm,), -0x80000000, jnp.int32)
    hi0 = jnp.full((bm,), 0x7FFFFFFF, jnp.int32)
    if 0 < top_k < V:
        lo, _ = jax.lax.fori_loop(0, 32, bisect_count, (lo0, hi0))
        keep = u >= lo[:, None]
    else:
        keep = jnp.ones_like(u, dtype=jnp.bool_)

    # ---- nucleus threshold over the kept set: keep x_j iff the exp-mass
    # strictly greater than x_j is < p * Z. Find the smallest kept value
    # with that property: bisect largest t with mass(u > t) >= p*Z, then
    # keep u > t. Invariant: mass(> lo) >= pZ, mass(> hi) < pZ.
    if 0.0 < top_p < 1.0:
        m = jnp.max(jnp.where(keep, x, -1e30), axis=-1, keepdims=True)
        e = jnp.where(keep, jnp.exp(x - m), 0.0)
        Z = jnp.sum(e, axis=-1, keepdims=False)
        pZ = jnp.float32(top_p) * Z

        def bisect_mass(_, lohi):
            lo, hi = lohi
            mid = _mid(lo, hi)
            mass = jnp.sum(jnp.where(u > mid[:, None], e, 0.0), axis=-1)
            ge = mass >= pZ
            return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 32, bisect_mass, (lo0, hi0))
        # after full bisection lo==hi-0: mass(> lo) >= pZ, mass(> lo+1) < pZ
        # -> elements with u > lo have strictly-greater mass < pZ... the
        # kept set is {u > lo} PLUS the argmax (never removed: helpers.py
        # keeps sorted position 0 unconditionally). When mass(>lo) == pZ
        # exactly the boundary matches torch's <= rule (cum <= 1-p removed).
        umax = jnp.max(u, axis=-1, keepdims=True)
        keep = keep & ((u > lo[:, None]) | (u == umax))

    mask_ref[...] = keep.astype(jnp.int8)

    # ---- Gumbel-max over the masked set
    if with_noise:
        g = noise_ref[...].astype(jnp.float32)
    else:
        if row_seed_ref is not None:
            # per-request streams: counter-based hash of (row seed, column)
            bits = _rowhash_bits(row_seed_ref[...], x.shape[0], V)
        else:
            # scalar-seed path: per-core PRNG (bit-identical to round 1)
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
            bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
        # int32 domain throughout: Mosaic has no uint32->f32 cast. The
        # arithmetic >>8 sign-extends; masking to 24 bits restores the
        # logical shift, and int32->f32 is exact for 24-bit values.
        b24 = (bits >> 8) & jnp.int32(0xFFFFFF)
        # uniform in (0, 1): 24 random bits, never 0 or 1
        u01 = b24.astype(jnp.float32) * jnp.float32(2**-24) \
            + jnp.float32(2**-25)
        g = -jnp.log(-jnp.log(u01))
    score = jnp.where(keep, x + g, -1e30)
    out_ref[...] = jnp.argmax(score, axis=-1, keepdims=True).astype(jnp.int32)


def _pick_bm(M: int, V: int) -> int:
    # keep x + e + u + noise comfortably under VMEM: bm * V * ~16B <= 4MB
    best = 8
    for bm in (256, 128, 64, 32, 16, 8):
        if M % bm == 0 and bm * V * 16 <= 4 * 1024 * 1024:
            return bm
    return best if M % best == 0 else 0


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "top_p", "interpret", "return_mask"),
)
def fused_sample(
    logits: jnp.ndarray,          # (B, l, V) or (M, V) f32/bf16
    seed: jnp.ndarray,            # scalar int32 (folded stream seed)
    top_k: int = 0, top_p: float = 0.0,
    noise: Optional[jnp.ndarray] = None,  # test hook: explicit Gumbel noise
    interpret: bool = False,
    return_mask: bool = False,
    row_seeds: Optional[jnp.ndarray] = None,  # (M,) int32 per-row streams
):
    """Sample ids from top-k/top-p filtered logits in ONE fused kernel.
    Returns (B, l) int32 ids (and the keep mask when ``return_mask``).

    ``row_seeds``: one int32 seed per flattened row — serving's per-request
    key arrays stay on this fast path (the scalar ``seed`` is ignored then).
    """
    shp = logits.shape
    V = shp[-1]
    M = 1
    for d in shp[:-1]:
        M *= d
    x = logits.reshape(M, V)
    bm = _pick_bm(M, V)
    assert bm and V % 128 == 0, (shp, bm)
    grid = (M // bm,)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    in_specs = [
        pl.BlockSpec((bm, V), lambda i, sref: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [x]
    with_noise = noise is not None
    if with_noise:
        in_specs.append(pl.BlockSpec((bm, V), lambda i, sref: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(noise.reshape(M, V).astype(jnp.float32))
    per_row = row_seeds is not None and not with_noise
    if per_row:
        in_specs.append(pl.BlockSpec((bm, 1), lambda i, sref: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(row_seeds, jnp.int32).reshape(M, 1))

    def entry(seed_ref, x_ref, *rest):
        pos = 0
        noise_ref = rest[pos] if with_noise else None
        pos += int(with_noise)
        row_seed_ref = rest[pos] if per_row else None
        out_ref, mask_ref = rest[-2], rest[-1]
        _kernel(x_ref, seed_ref, out_ref, mask_ref, top_k=top_k,
                top_p=top_p, V=V, with_noise=with_noise,
                noise_ref=noise_ref, row_seed_ref=row_seed_ref)

    out, mask = pl.pallas_call(
        entry,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((bm, 1), lambda i, sref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, V), lambda i, sref: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, 1), jnp.int32),
            jax.ShapeDtypeStruct((M, V), jnp.int8),
        ),
        interpret=interpret,
    )(seed_arr, *inputs)
    ids = out.reshape(shp[:-1])
    if return_mask:
        return ids, mask.reshape(shp)
    return ids
