"""Explicit TP/DP partitioning for the Pallas kernels (shard_map wrappers).

Mosaic kernels cannot be automatically partitioned by GSPMD: compiling a
program in which a "model"-sharded operand reaches a ``pallas_call`` fails
with "Mosaic kernels cannot be automatically partitioned. Please wrap the
call in a shard_map." (verified against the AOT v5e:2x4 topology —
tests/test_tp_pallas.py). The reference never faced this: its CUDA kernels
ran per-rank under pure data parallelism (reference: models/basic_var.py:
14-30, train.py:102). Under tensor parallelism the kernel partitioning must
be explicit, and this module owns it:

  - attention: batch over "data", heads over "model" (the merged-head
    trailing dim is sharded head-aligned when ``num_heads % model == 0`` —
    matching parallel/mesh.var_param_specs' column sharding of qkv_w);
    bias replicated; per-token INT8 scale planes batch-sharded.
  - fused sampler: flattened rows over "data"; the vocab axis is gathered
    at the shard_map boundary (both filters need full rows; GSPMD inserts
    the all-gather of the model-sharded logits automatically). Restricted
    to per-row-seed streams — their noise is a pure function of
    (request key, position), so results are topology-invariant; scalar-key
    sampling falls back to the XLA path, which partitions deterministically.

When shapes don't divide the mesh (e.g. d30's 30 heads on a 4-way model
axis) the wrappers return None and the caller falls back to the XLA
composition, which GSPMD partitions fine.

A trace-time registry (``set_tp_mesh``) mirrors ops/attention's impl
switch: set the mesh before building jitted programs.
"""

from __future__ import annotations

import inspect
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sdvar_tpu.parallel.mesh import DATA, MODEL

_TP_MESH: Optional[Mesh] = None
_INTERPRET = False


def set_tp_mesh(mesh: Optional[Mesh]) -> None:
    """Register the device mesh Pallas kernels should shard over. Read at
    TRACE time (like set_attention_impl). None disables wrapping."""
    global _TP_MESH
    assert mesh is None or (DATA in mesh.shape and MODEL in mesh.shape), mesh
    _TP_MESH = mesh


def get_tp_mesh() -> Optional[Mesh]:
    return _TP_MESH


def pallas_interpret() -> bool:
    return _INTERPRET


def set_pallas_interpret(on: bool) -> None:
    """Run Pallas kernels in interpret mode (CPU tests of the TPU-gated
    paths; tests/test_tp_pallas.py)."""
    global _INTERPRET
    _INTERPRET = bool(on)


def _active_mesh() -> Optional[Mesh]:
    m = _TP_MESH
    if m is None or m.shape[DATA] * m.shape[MODEL] <= 1:
        return None
    return m


def tp_mesh_active() -> bool:
    """True when a >1-device mesh is registered — i.e. Mosaic kernels MUST
    go through shard_map (or fall back to XLA). A 1-device mesh is a no-op
    (the reference's "not initialized -> no-op" analogue): the unsharded
    fast paths stay legal and callers must keep using them — treating a
    1-device mesh as active silently re-routed the whole int8 decode onto
    the XLA dequant path (measured 3.7 vs 14+ img/s serving, round 3)."""
    return _active_mesh() is not None


def _shard_map(fn, mesh, in_specs, out_specs):
    sig = inspect.signature(jax.shard_map).parameters
    kw = {"mesh": mesh, "in_specs": in_specs, "out_specs": out_specs}
    if "check_vma" in sig:
        kw["check_vma"] = False
    elif "check_rep" in sig:
        kw["check_rep"] = False
    return jax.shard_map(fn, **kw)


def sharded_pallas_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray], scale: float,
    kv_token_major: bool = False,
    kv_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """shard_map-wrapped fused attention over the registered mesh.

    Returns None when no >1-device mesh is registered or shapes don't
    divide it (caller falls back). Per shard the kernel sees B/data batch
    rows and H/model heads; no collectives are needed inside (softmax and
    PV contract over Lk/hd, which stay unsharded)."""
    mesh = _active_mesh()
    if mesh is None:
        return None
    dp, tp = mesh.shape[DATA], mesh.shape[MODEL]
    B, Lq, H, hd = q.shape
    Lk = k.shape[0] if kv_token_major else k.shape[1]
    kB = k.shape[1] if kv_token_major else k.shape[0]
    if H % tp or B % dp or kB % dp:
        return None
    if ((H // tp) * hd) % 128:
        # Mosaic block lanes must be 128-divisible: per-shard merged heads
        # (H/tp)*hd set the kernel's lane blocks (e.g. 1 head x hd=64 per
        # shard cannot lower — caught by the AOT v5e:2x4 compile test)
        return None
    del Lk

    from sdvar_tpu.ops.pallas.attention import pallas_attention

    qs = P(DATA, None, MODEL, None)
    ks = P(None, DATA, MODEL, None) if kv_token_major else qs
    specs = [qs, ks, ks]
    args = [q, k, v]
    has_scales = kv_scales is not None
    has_bias = bias is not None
    if has_scales:
        specs += [P(None, DATA), P(None, DATA)]   # (Lk, B) planes
        args += [kv_scales[0], kv_scales[1]]
    if has_bias:
        specs.append(P(None, None))
        args.append(bias)

    def fn(q, k, v, *rest):
        it = iter(rest)
        scales = (next(it), next(it)) if has_scales else None
        b = next(it) if has_bias else None
        return pallas_attention(q, k, v, b, scale, interpret=interpret,
                                kv_token_major=kv_token_major,
                                kv_scales=scales)

    return _shard_map(fn, mesh, tuple(specs), qs)(*args)


def sharded_fused_sample(
    logits: jnp.ndarray,           # (B, l, V) or (B, V) f32
    row_seeds: jnp.ndarray,        # (M,) int32 per-row streams (required:
                                   # topology-invariant by construction)
    top_k: int, top_p: float,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """shard_map-wrapped fused sampler: rows over "data", vocab gathered.

    Returns None when no mesh or the per-shard row count breaks the
    kernel's sublane rule (M/data % 8)."""
    mesh = _active_mesh()
    if mesh is None:
        return None
    dp = mesh.shape[DATA]
    B = logits.shape[0]
    M = 1
    for d in logits.shape[:-1]:
        M *= d
    if B % dp or (M // dp) % 8:
        return None

    from sdvar_tpu.ops.pallas.sampling import fused_sample

    lspec = P(*((DATA,) + (None,) * (logits.ndim - 1)))
    ospec = P(*((DATA,) + (None,) * (logits.ndim - 2)))

    def fn(lg, rs):
        return fused_sample(lg, jnp.int32(0), top_k, top_p,
                            row_seeds=rs, interpret=interpret)

    return _shard_map(fn, mesh, (lspec, P(DATA)), ospec)(
        logits, jnp.asarray(row_seeds, jnp.int32))
