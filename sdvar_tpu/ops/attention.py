"""Attention backend dispatch (the analogue of the reference's
flash/xformers/SDPA auto-selection, models/basic_var.py:14-30,97-117).

Backends:
  "xla"    — einsum + softmax; XLA fuses what it can. Always correct.
  "pallas" — fused VMEM-resident kernel (ops/pallas/attention.py); avoids
             materializing the (B, H, Lq, Lk) score tensor in HBM.
  "auto"   — pallas on TPU backends, xla elsewhere.

The choice is read at TRACE time: call set_attention_impl() before building
jitted functions (changing it later requires retracing, like swapping
attention libraries in the reference requires re-import).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "auto"


def set_attention_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _IMPL = impl


_CACHE_KERNEL = False


def set_cache_kernel(on: bool) -> None:
    global _CACHE_KERNEL
    _CACHE_KERNEL = on


def use_cache_kernel() -> bool:
    """Whether the full-cache Pallas kernel (pallas_attention_cache) is used
    for KV-cached attention. OFF by default: it avoids the per-layer slice
    copy by reading the stacked cache via a scalar-prefetched layer index,
    but a pallas_call operand is a custom call XLA cannot alias-analyze, so
    the scan-carried cache loses its in-place update and gets copied
    wholesale every layer — measured 1870 vs 533 ms (bf16 KV) and 2951 vs
    507 ms (int8 KV) on d30 B=16. Kept behind this switch (and under test)
    as the building block for a future in-kernel cache-write design with
    input_output_aliases, which is what would make it profitable."""
    return (_CACHE_KERNEL and _IMPL != "xla"
            and jax.default_backend() in ("tpu", "axon"))


def get_attention_impl(Lq: int = 0, Lk: int = 0) -> str:
    if _IMPL != "auto":
        return _IMPL
    # auto: the merged-layout Pallas kernel wins on TPU once the query block
    # is big enough to amortize the grid (XLA's path materializes f32 scores
    # in HBM, ~2 ms/layer at d30 scale 9); smaller scales measured FASTER on
    # XLA (d30 B=16: Lq=100 regressed ~20 ms per scale under the kernel), so
    # the gate sits above them — EXCEPT Lq=64, where XLA's einsum flips the
    # whole KV cache to a batch-minor layout for that one scale's while loop
    # and pays four full-cache layout copies (~31 ms at d30 B=16, plus two
    # cache-sized HLO temps that OOM B>=24). The Pallas kernel pins the
    # natural token-major layout, so it wins there even though the kernel
    # itself is slightly slower than XLA's attention at that size.
    if jax.default_backend() in ("tpu", "axon") and (Lq >= 160 or Lq == 64):
        return "pallas"
    return "xla"


def _pallas_backend() -> bool:
    from sdvar_tpu.ops.partition import pallas_interpret

    return jax.default_backend() in ("tpu", "axon") or pallas_interpret()


def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray], scale: float,
    kv_token_major: bool = False,
    kv_scales=None,
) -> jnp.ndarray:
    """q: (B, Lq, H, d); k/v: (B, Lk, H, d), or (Lk, B, H, d) when
    ``kv_token_major`` (KV-cache slices are stored token-major — see
    models/var.KVCache); bias: (Lq, Lk) or None. Returns (B, Lq, H, d).

    ``kv_scales``: ((Lk, B), (Lk, B)) f32 per-token scales when k/v are INT8
    KV-cache slices. On TPU the dequant fuses into the Pallas kernel (int8
    never materializes as bf16 in HBM); elsewhere dequant happens here.

    Under a registered TP/DP mesh (ops/partition.set_tp_mesh) the Pallas
    call is shard_map-wrapped — Mosaic kernels cannot be GSPMD-partitioned
    (hard compile error on multi-chip meshes); incompatible shapes fall
    back to the XLA composition, which partitions automatically."""
    from sdvar_tpu.ops.partition import (
        pallas_interpret,
        sharded_pallas_attention,
        tp_mesh_active,
    )

    Lk = k.shape[0] if kv_token_major else k.shape[1]
    if kv_scales is not None:
        # prefer the Pallas kernel on TPU: the XLA path would write a full
        # dequantized bf16 copy of the cache slice per layer (measured
        # 798 vs 533 ms on w8a8 d30 B=16 — BENCHMARKS.md)
        if _IMPL != "xla" and _pallas_backend():
            out = sharded_pallas_attention(
                q, k, v, bias, scale, kv_token_major=kv_token_major,
                kv_scales=kv_scales, interpret=pallas_interpret())
            if out is not None:
                return out
            if not tp_mesh_active():
                from sdvar_tpu.ops.pallas.attention import pallas_attention

                return pallas_attention(q, k, v, bias, scale,
                                        interpret=pallas_interpret(),
                                        kv_token_major=kv_token_major,
                                        kv_scales=kv_scales)
            # active multi-device mesh but shapes don't divide it: XLA
        from sdvar_tpu.ops.pallas.attention import _dequant_kv

        k, v = _dequant_kv(k, v, kv_scales, q.dtype)
    else:
        impl = get_attention_impl(q.shape[1], Lk)
        if impl == "pallas":
            out = sharded_pallas_attention(
                q, k, v, bias, scale, kv_token_major=kv_token_major,
                interpret=pallas_interpret())
            if out is not None:
                return out
            if not tp_mesh_active():
                from sdvar_tpu.ops.pallas.attention import pallas_attention

                return pallas_attention(q, k, v, bias, scale,
                                        interpret=pallas_interpret(),
                                        kv_token_major=kv_token_major)
    kidx = "kbhd" if kv_token_major else "bkhd"
    logits = jnp.einsum(f"bqhd,{kidx}->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[None, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(f"bhqk,{kidx}->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
