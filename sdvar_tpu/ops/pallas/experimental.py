"""EXPERIMENTAL full-cache / cache-write attention kernels — measured,
documented, NOT adopted (see BENCHMARKS.md "cache-write kernel A/B"):

  - ``pallas_attention_cache`` reads the layer-stacked KV cache directly via
    a scalar-prefetched layer index, avoiding the per-layer slice copy — but
    a pallas_call operand is a custom call XLA cannot alias-analyze, so the
    scan-carried cache loses its in-place update and is copied wholesale
    every layer (measured 1870 vs 533 ms bf16-KV, d30 B=16).
  - ``pallas_attention_cache_write`` additionally DMAs the new tokens' KV
    into the cache in-kernel with input_output_aliases (no XLA
    dynamic-update-slice) — measured 9859 vs 627 ms at d30 B=16: Mosaic
    serializes the read-merge-write DMA against the attention compute.

Kept under test (tests/test_pallas_attention.py) as building blocks for a
future design; production dispatch (ops/attention.py use_cache_kernel) is
OFF by default. Quarantined here so the production kernel file stays lean
(VERDICT round-2 "Weak #7").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdvar_tpu.ops.pallas.attention import _choose_blocking


def _cache_kernel(li_ref, q_ref, k_ref, v_ref, *rest, scale, hpp, hd,
                  Lk, Lk_pad, has_scales, has_bias):
    """Full-cache variant: k_ref/v_ref are (1, Lk_pad, blk) blocks DMA'd
    straight out of the (depth, L_max, B*C) cache at the scalar-prefetched
    layer index — the cache slice never materializes as an XLA temp (the
    sliced-operand form costs a full copy per layer around the kernel:
    ~20 ms/decode at d30 B=16 — see BENCHMARKS.md). Rows beyond the live
    kv_len are masked with -inf (Lk_pad rounds kv_len up to a sublane
    multiple; slots there hold zeros or stale tokens, never read uninit).

    rest: [ks_ref, vs_ref] (1, B, L_max) f32 if has_scales, then [bias_ref]
    (blkq, Lk_pad) f32 if has_bias, then o_ref (1, blkq, blk).
    """
    del li_ref  # consumed by the index_maps
    it = iter(rest)
    ks_ref = next(it) if has_scales else None
    vs_ref = next(it) if has_scales else None
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b = pl.program_id(0)
    ks = vs = None
    if ks_ref is not None:
        # extract batch row b without a dynamic ref index (Mosaic rejects
        # dynamic sublane loads at unaligned lane offsets): mask+reduce over
        # the (B, L_max) plane — B*L_max VPU adds, negligible.
        def _row(ref):
            plane = ref[0]  # (B, L_max)
            rowmask = jax.lax.broadcasted_iota(
                jnp.int32, plane.shape, 0) == b
            row = jnp.sum(jnp.where(rowmask, plane, 0.0), axis=0,
                          keepdims=True)  # (1, L_max)
            return row[:, :Lk_pad]

        ks = _row(ks_ref)
        vs = _row(vs_ref)
    pad_mask = None
    if Lk_pad > Lk:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
        pad_mask = col >= Lk
    outs = []
    for j in range(hpp):
        sl = slice(j * hd, (j + 1) * hd)
        kj = k[:, sl]
        if kj.dtype == jnp.int8:
            kj = kj.astype(q.dtype)
        s = jax.lax.dot_general(
            q[:, sl], kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if ks is not None:
            s = s * ks
        if bias_ref is not None:
            s = s + bias_ref[...]
        if pad_mask is not None:
            s = jnp.where(pad_mask, -jnp.inf, s)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
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
        outs.append(o / jnp.maximum(l, 1e-30))  # normalize post-dot (see _kernel)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def pallas_attention_cache(
    q: jnp.ndarray,            # (B, Lq, H, hd)
    cache_k: jnp.ndarray,      # (depth, L_max, B, C) bf16/f32/int8
    cache_v: jnp.ndarray,
    layer_idx: jnp.ndarray,    # traced int32 scalar (scan carry)
    kv_len: int,               # static live length
    bias: Optional[jnp.ndarray] = None,   # (Lq, kv_len) additive
    scale: float = 1.0,
    kv_scales=None,            # ((depth, B, L_max), (depth, B, L_max)) f32
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Attention over a layer-stacked KV cache without slicing it first.

    Returns None if the shape doesn't fit the kernel's tiling rules (caller
    falls back to slice + regular paths). Inference-only (no VJP).
    """
    B, Lq, H, hd = q.shape
    depth, Lmax = cache_k.shape[0], cache_k.shape[1]
    C = H * hd
    Lk = kv_len
    Lk_pad = min(-(-Lk // 8) * 8, Lmax)
    if Lk_pad < Lk:
        return None
    choice = _choose_blocking(H, hd, Lq, Lk_pad,
                              jnp.dtype(cache_k.dtype).itemsize,
                              has_bias=bias is not None)
    if choice is None:
        return None
    hpp, blkq = choice
    blk = hpp * hd
    nq = Lq // blkq

    qm = q.reshape(B, Lq, C)
    km = cache_k.reshape(depth, Lmax, B * C)
    vm = cache_v.reshape(depth, Lmax, B * C)
    lanes_per_b = C // blk
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    qspec = pl.BlockSpec((1, blkq, blk),
                         lambda b, h, i, li_ref: (b, i, h),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(
        (1, Lk_pad, blk),
        # depth offset in units of the block (=1 layer); row block 0 covers
        # [0, Lk_pad); lane block = this (batch, head-group) window
        lambda b, h, i, li_ref: (li_ref[0], 0, b * lanes_per_b + h),
        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, blkq, blk),
                         lambda b, h, i, li_ref: (b, i, h),
                         memory_space=pltpu.VMEM)
    inputs = [qm, km, vm]
    in_specs = [qspec, kspec, kspec]
    if kv_scales is not None:
        k_s, v_s = kv_scales
        sspec = pl.BlockSpec((1, B, Lmax),
                             lambda b, h, i, li_ref: (li_ref[0], 0, 0),
                             memory_space=pltpu.VMEM)
        inputs += [k_s, v_s]
        in_specs += [sspec, sspec]
    if bias is not None:
        bpad = jnp.pad(bias.astype(jnp.float32),
                       ((0, 0), (0, Lk_pad - Lk)))
        inputs.append(bpad)
        in_specs.append(pl.BlockSpec((blkq, Lk_pad),
                                     lambda b, h, i, li_ref: (i, 0),
                                     memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hpp, nq),
        in_specs=in_specs,
        out_specs=ospec,
    )
    cost = pl.CostEstimate(
        flops=2 * 2 * B * H * Lq * Lk_pad * hd,
        bytes_accessed=(2 * B * Lq * C
                        + 2 * B * Lk_pad * C * cache_k.dtype.itemsize),
        transcendentals=B * H * Lq * Lk_pad,
    )
    out = pl.pallas_call(
        functools.partial(_cache_kernel, scale=scale, hpp=hpp, hd=hd,
                          Lk=Lk, Lk_pad=Lk_pad,
                          has_scales=kv_scales is not None,
                          has_bias=bias is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(li, *inputs)
    return out.reshape(B, Lq, H, hd)


def _write_kernel(li_ref, q_ref, knew_ref, vnew_ref, ck_in, cv_in, *rest,
                  scale, hpp, hd, bg, bg_al, W, Lq, Lk, Lk_pad, R,
                  lanes_per_b, B, Lmax, has_scales, has_bias):
    """Cache-WRITE variant (VERDICT round-1 item #7): one kernel updates the
    layer-stacked KV cache with the new tokens AND computes attention, with
    the cache aliased through the pallas_call (input_output_aliases) so the
    scan-carried cache keeps a single buffer — no XLA dynamic_update_slice,
    no conservatively-copied custom-call operand (the 1870 ms failure mode
    of the read-only cache kernel).

    Mosaic constrains HBM slices to 8-aligned sublane windows, and the
    per-scale offsets (bg) are arbitrary, so the update is read-merge-write:
      1. DMA-read rows [0, Lk_pad) of this (batch, head-group) lane window;
      2. compose the aligned write block [bg_al, W) = old rows [bg_al, bg)
         + new rows (static offsets -> plain value concat), stage it in a
         VMEM scratch, DMA it back (8-aligned both ends);
      3. compose attention keys/values the same way (old prefix + new rows)
         — no re-read needed, and rows >= Lk are masked.
    INT8 per-token scale planes ride as VMEM-blocked aliased outputs: every
    program writes the same merged (B, L_max) plane for its layer
    (idempotent; the plane is ~90 KB).

    rest layout: [kts_ref, vts_ref (B, Lq) f32, cks_in, cvs_in] if
    has_scales, [bias_ref (blkq, Lk_pad)] if has_bias, then outputs
    [o_ref, ck_out, cv_out, (cks_out, cvs_out)] and scratch
    [k_tile, v_tile, wk_tile, wv_tile, sem].
    """
    del ck_in, cv_in  # aliased: all access goes through the out refs
    it = iter(rest)
    kts_ref = next(it) if has_scales else None
    vts_ref = next(it) if has_scales else None
    cks_in = next(it) if has_scales else None
    cvs_in = next(it) if has_scales else None
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    ck_out = next(it)
    cv_out = next(it)
    cks_out = next(it) if has_scales else None
    cvs_out = next(it) if has_scales else None
    k_tile = next(it)
    v_tile = next(it)
    wk_tile = next(it)
    wv_tile = next(it)
    sem = next(it)

    li = li_ref[0]
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    lane0 = (b * lanes_per_b + h) * hpp * hd
    blk = hpp * hd

    # -- 1. read rows [0, R) (R covers both the attention window Lk_pad
    # and the aligned write window end W, so fill rows preserve old values)
    rk = pltpu.make_async_copy(
        ck_out.at[li, pl.ds(0, R), pl.ds(lane0, blk)], k_tile, sem)
    rk.start()
    rk.wait()
    rv = pltpu.make_async_copy(
        cv_out.at[li, pl.ds(0, R), pl.ds(lane0, blk)], v_tile, sem)
    rv.start()
    rv.wait()

    kold = k_tile[...]
    vold = v_tile[...]
    knew = knew_ref[...]
    vnew = vnew_ref[...]

    # -- 2. aligned write-back of [bg_al, W) ------------------------------
    @pl.when(i == 0)
    def _write():
        # zero-size vector slices are rejected by Mosaic: include only
        # the nonempty parts
        parts_k, parts_v = [], []
        if bg > bg_al:
            parts_k.append(kold[bg_al:bg])
            parts_v.append(vold[bg_al:bg])
        parts_k.append(knew)
        parts_v.append(vnew)
        if W > bg + Lq:
            parts_k.append(kold[bg + Lq: W])
            parts_v.append(vold[bg + Lq: W])
        wk_tile[...] = (parts_k[0] if len(parts_k) == 1
                        else jnp.concatenate(parts_k, axis=0))
        wv_tile[...] = (parts_v[0] if len(parts_v) == 1
                        else jnp.concatenate(parts_v, axis=0))
        wk = pltpu.make_async_copy(
            wk_tile, ck_out.at[li, pl.ds(bg_al, W - bg_al),
                               pl.ds(lane0, blk)], sem)
        wk.start()
        wk.wait()
        wv = pltpu.make_async_copy(
            wv_tile, cv_out.at[li, pl.ds(bg_al, W - bg_al),
                               pl.ds(lane0, blk)], sem)
        wv.start()
        wv.wait()

    # -- scale planes (INT8): merge + write the whole (B, Lmax) plane ----
    ks = vs = None
    if has_scales:
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Lmax), 1)
        in_new = jnp.logical_and(col >= bg, col < bg + Lq)

        def merged(plane_ref, ts_ref):
            plane = plane_ref[0]                       # (B, Lmax)
            ts = ts_ref[...]                           # (B, Lq)
            padded = jnp.pad(ts, ((0, 0), (bg, Lmax - bg - Lq)))
            return jnp.where(in_new, padded, plane)

        ks_plane = merged(cks_in, kts_ref)
        vs_plane = merged(cvs_in, vts_ref)
        cks_out[0] = ks_plane
        cvs_out[0] = vs_plane
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (B, Lmax), 0) == b)
        ks = jnp.sum(jnp.where(rowmask, ks_plane, 0.0), axis=0,
                     keepdims=True)[:, :Lk_pad]        # (1, Lk_pad)
        vs = jnp.sum(jnp.where(rowmask, vs_plane, 0.0), axis=0,
                     keepdims=True)[:, :Lk_pad]

    # -- 3. attention over [0, Lk_pad) with composed keys/values ----------
    n_new = Lk - bg    # true new tokens (Lq may include padding rows)
    ka, va = [], []
    if bg > 0:
        ka.append(kold[:bg])
        va.append(vold[:bg])
    ka.append(knew[:n_new])
    va.append(vnew[:n_new])
    if Lk_pad > Lk:
        ka.append(kold[Lk:Lk_pad])
        va.append(vold[Lk:Lk_pad])
    k = ka[0] if len(ka) == 1 else jnp.concatenate(ka, axis=0)
    v = va[0] if len(va) == 1 else jnp.concatenate(va, axis=0)

    q = q_ref[0]
    pad_mask = None
    if Lk_pad > Lk:
        colq = jax.lax.broadcasted_iota(jnp.int32, (1, Lk_pad), 1)
        pad_mask = colq >= Lk
    outs = []
    for j in range(hpp):
        sl = slice(j * hd, (j + 1) * hd)
        kj = k[:, sl]
        if kj.dtype == jnp.int8:
            kj = kj.astype(q.dtype)
        s = jax.lax.dot_general(
            q[:, sl], kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if ks is not None:
            s = s * ks
        if bias_ref is not None:
            s = s + bias_ref[...]
        if pad_mask is not None:
            s = jnp.where(pad_mask, -jnp.inf, s)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
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
        outs.append(o / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def pallas_attention_cache_write(
    q: jnp.ndarray,            # (B, Lq, H, hd) compute dtype
    k_new: jnp.ndarray,        # (Lq, B, C) token-major, cache dtype
    v_new: jnp.ndarray,
    cache_k: jnp.ndarray,      # (depth, L_max, B, C)
    cache_v: jnp.ndarray,
    layer_idx: jnp.ndarray,    # traced int32 scalar (scan carry)
    cache_begin: int, kv_len: int,
    bias: Optional[jnp.ndarray] = None,   # (Lq, kv_len)
    scale: float = 1.0,
    new_scales=None,           # ((B, Lq), (B, Lq)) f32 when int8
    cache_scales=None,         # ((depth, B, L_max), (depth, B, L_max)) f32
    interpret: bool = False,
):
    """Fused cache-update + attention. Returns (out, cache_k, cache_v
    [, cks, cvs]) with the caches aliased through the call, or None when the
    shapes don't fit the tiling rules (caller falls back)."""
    B, Lq, H, hd = q.shape
    depth, Lmax = cache_k.shape[0], cache_k.shape[1]
    C = H * hd
    hpp = 1
    for h in range(2, 9):
        if H % h == 0 and (h * hd) % 128 == 0:
            hpp = h
    blk = hpp * hd
    Lk = kv_len
    Lk_pad = min(-(-Lk // 8) * 8, Lmax)
    if Lk_pad < Lk:
        return None
    bg = cache_begin
    bg_al = (bg // 8) * 8
    W = min(-(-(bg + Lq) // 8) * 8, Lmax)
    if (W - bg_al) % 8 != 0 or W < bg + Lq:
        return None    # unalignable tail (e.g. 1024px Lmax=9451)
    R = max(Lk_pad, W)
    stack_budget = 14_000_000  # hpp unrolled heads' f32 scores (see
    blkq = Lq                  # _pallas_forward's measured budget rationale)
    if Lq * Lk_pad * 4 > 4 * 1024 * 1024 or Lq > 256 \
            or hpp * Lq * Lk_pad * 4 > stack_budget:
        best = None
        for d in range(8, min(Lq, 256) + 1, 8):
            if Lq % d == 0 and d * Lk_pad * 4 <= 4 * 1024 * 1024 \
                    and hpp * d * Lk_pad * 4 <= stack_budget:
                best = d
        if best is None:
            return None
        blkq = best
    nq = Lq // blkq
    has_scales = cache_scales is not None

    qm = q.reshape(B, Lq, C)
    km3 = cache_k.reshape(depth, Lmax, B * C)
    vm3 = cache_v.reshape(depth, Lmax, B * C)
    knew2 = k_new.reshape(Lq, B * C)
    vnew2 = v_new.reshape(Lq, B * C)
    lanes_per_b = C // blk
    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    qspec = pl.BlockSpec((1, blkq, blk), lambda b, h, i, s: (b, i, h),
                         memory_space=pltpu.VMEM)
    newspec = pl.BlockSpec((Lq, blk),
                           lambda b, h, i, s: (0, b * lanes_per_b + h),
                           memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    ospec = pl.BlockSpec((1, blkq, blk), lambda b, h, i, s: (b, i, h),
                         memory_space=pltpu.VMEM)

    inputs = [qm, knew2, vnew2, km3, vm3]
    in_specs = [qspec, newspec, newspec, anyspec, anyspec]
    # alias indices count the scalar-prefetch operand (li = 0)
    aliases = {4: 1, 5: 2}
    out_shapes = [
        jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
        jax.ShapeDtypeStruct(km3.shape, km3.dtype),
        jax.ShapeDtypeStruct(vm3.shape, vm3.dtype),
    ]
    out_specs = [ospec, anyspec, anyspec]
    if has_scales:
        kts, vts = new_scales
        cks, cvs = cache_scales
        tsspec = pl.BlockSpec((B, Lq), lambda b, h, i, s: (0, 0),
                              memory_space=pltpu.VMEM)
        planespec = pl.BlockSpec((1, B, Lmax),
                                 lambda b, h, i, s: (s[0], 0, 0),
                                 memory_space=pltpu.VMEM)
        inputs += [kts.astype(jnp.float32), vts.astype(jnp.float32),
                   cks, cvs]
        in_specs += [tsspec, tsspec, planespec, planespec]
        aliases[8] = 3
        aliases[9] = 4
        out_shapes += [jax.ShapeDtypeStruct(cks.shape, cks.dtype),
                       jax.ShapeDtypeStruct(cvs.shape, cvs.dtype)]
        out_specs += [planespec, planespec]
    if bias is not None:
        bpad = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, Lk_pad - Lk)))
        inputs.append(bpad)
        in_specs.append(pl.BlockSpec((blkq, Lk_pad),
                                     lambda b, h, i, s: (i, 0),
                                     memory_space=pltpu.VMEM))

    scratch = [
        pltpu.VMEM((R, blk), cache_k.dtype),
        pltpu.VMEM((R, blk), cache_v.dtype),
        pltpu.VMEM((W - bg_al, blk), cache_k.dtype),
        pltpu.VMEM((W - bg_al, blk), cache_v.dtype),
        pltpu.SemaphoreType.DMA,
    ]

    cost = pl.CostEstimate(
        flops=2 * 2 * B * H * Lq * Lk_pad * hd,
        bytes_accessed=(2 * B * Lq * C
                        + 2 * B * Lk_pad * C * cache_k.dtype.itemsize),
        transcendentals=B * H * Lq * Lk_pad,
    )
    outs = pl.pallas_call(
        functools.partial(
            _write_kernel, scale=scale, hpp=hpp, hd=hd, bg=bg,
            bg_al=bg_al, W=W, Lq=Lq, Lk=Lk, Lk_pad=Lk_pad, R=R,
            lanes_per_b=lanes_per_b, B=B, Lmax=Lmax,
            has_scales=has_scales, has_bias=bias is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H // hpp, nq),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(li, *inputs)
    out = outs[0].reshape(B, Lq, H, hd)
    ck = outs[1].reshape(depth, Lmax, B, C)
    cv = outs[2].reshape(depth, Lmax, B, C)
    if has_scales:
        return out, ck, cv, outs[3], outs[4]
    return out, ck, cv
