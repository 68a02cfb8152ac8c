"""Weight-only INT8 quantization and INT8 KV cache.

BASELINE.json config #3: "VAR-d30 weight-only INT8/FP8 + INT8 KV-cache,
quality parity vs fp16 reference". The reference has no quantization — this
is a TPU-native addition per the north star (SURVEY.md §6).

Scheme:
  - weights: symmetric per-output-channel INT8; w ≈ q * s with
    q int8 (in, out), s f32 (out,). Matmuls run int8->bf16 dequant fused by
    XLA into the MXU feed (a Pallas fused-dequant kernel can slot in later;
    the numerics and API stay identical).
  - KV cache: symmetric per-token INT8 (amax over the model dim of each
    written token); dequantized on read. Rollback-by-offset still works —
    scales live beside the cache at the same offsets.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sdvar_tpu.config import VARConfig


class QuantizedLinear(NamedTuple):
    q: jnp.ndarray       # int8, (in, out) (or stacked (depth, in, out))
    scale: jnp.ndarray   # f32, (out,)  (or (depth, out))


class W8A8Linear(NamedTuple):
    """INT8 weight whose matmuls ALSO quantize the activation per token
    (dynamic symmetric W8A8). The leaf type selects the behavior at trace
    time; fields are identical to QuantizedLinear so checkpoints interop.

    Why it is fast on TPU: the MXU runs int8 x int8 at 2x the bf16 rate
    (v5e: 394 vs 197 TOPS). XLA reaches that path when BOTH dot operands
    are convert(int8 -> bf16) — measured 292 vs 171 TFLOP/s effective on
    the d30 decode GEMMs (tools/microbench_int8_matmul.py). int8 values
    are exact in bf16 (8 mantissa bits) so the only numerics delta vs an
    int32-exact dot is f32-accumulation rounding, which is ~1e-7 relative.
    Round-2 compiler note: the exact int8 x int8 -> int32 dot was then
    SLOWER than bf16 (167 TFLOP/s); as of round 4 it lowers to the same
    fast MXU mode as the convert form (242 vs 245 TFLOP/s on fc1) — which
    is what makes the fused-activation-quant path (set_fused_act_quant /
    w8a8_prequant_matmul) viable.
    """

    q: jnp.ndarray       # int8, (in, out) (or stacked (depth, in, out))
    scale: jnp.ndarray   # f32, (out,)  (or (depth, out))


class FP8Linear(NamedTuple):
    """float8_e4m3 weight + per-output-channel f32 scale, bf16 compute
    (dequant fused into the MXU feed like the int8 path). Same byte
    footprint as INT8; e4m3 trades the int grid's uniform steps for 3-bit
    mantissa precision concentrated near zero (north star: "INT8/FP8")."""

    q: jnp.ndarray       # float8_e4m3fn, (in, out) (or (depth, in, out))
    scale: jnp.ndarray   # f32, (out,)  (or (depth, out))


FP8_MAX = 448.0  # largest finite e4m3 value


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> QuantizedLinear:
    """Symmetric per-output-channel int8: amax over the INPUT axis."""
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / jnp.maximum(scale, 1e-12)), -127, 127).astype(
        jnp.int8
    )
    return QuantizedLinear(q=q, scale=jnp.squeeze(scale, axis=axis))


def quantize_weight_fp8(w: jnp.ndarray, axis: int = -2) -> FP8Linear:
    """Symmetric per-output-channel e4m3: amax maps to FP8_MAX."""
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = (amax / FP8_MAX).astype(jnp.float32)
    q = (w / jnp.maximum(scale, 1e-12)).astype(jnp.float8_e4m3fn)
    return FP8Linear(q=q, scale=jnp.squeeze(scale, axis=axis))


def dequantize_weight(qw, dtype=jnp.bfloat16) -> jnp.ndarray:
    if qw.q.ndim == 3:
        return (qw.q.astype(jnp.float32) * qw.scale[:, None, :]).astype(dtype)
    return (qw.q.astype(jnp.float32) * qw.scale[None, :]).astype(dtype)


WEIGHT_KEYS = ("qkv_w", "proj_w", "fc1_w", "fc2_w", "ada_lin_w")
# weights whose matmuls take the W8A8 activation-quant path in "w8a8" mode.
# ada_lin_w is excluded (tiny, precomputed once per generation); the logits
# head is gated by ``act_head`` (extra quantization noise right before
# sampling is the one place quality is sensitive).
W8A8_KEYS = ("qkv_w", "proj_w", "fc1_w", "fc2_w")


def quantize_var_params(params: Dict, keys: Tuple[str, ...] = WEIGHT_KEYS,
                        quantize_head: Optional[bool] = None,
                        mode: str = "w8", act_head: bool = False) -> Dict:
    """Return a param tree where the transformer's big matmul weights are
    QuantizedLinear pairs. Embeddings/norm-side params stay fp.

    ``mode``: "w8" = weight-only INT8 (activations bf16); "w8a8" = also
    quantize activations per token at each block matmul (W8A8Linear leaves,
    2x MXU rate on TPU); "fp8" = weight-only float8_e4m3 storage with bf16
    compute (same bytes as w8; no 2x MXU path on v5e — int8 is the hardware
    fast path there, e4m3 exists for quality comparison and fp8-native
    chips). The same pytree runs through the same forward code —
    models/var.py resolves quantized leaves via ``resolve_weight``.

    ``quantize_head`` defaults per mode: True for int8 (per-channel int8
    logits keep argmax agreement high), False for fp8 — e4m3's 3-bit
    mantissa right before sampling flips argmaxes (measured on the mid-size
    oracle: head-e4m3 0.57 token agreement vs head-bf16 0.998; the head is
    <1% of d30's weight bytes, so storing it bf16 costs nothing).
    """
    assert mode in ("w8", "w8a8", "fp8"), mode
    if quantize_head is None:
        quantize_head = mode != "fp8"
    qfn = quantize_weight_fp8 if mode == "fp8" else quantize_weight
    out = dict(params)
    blocks = dict(params["blocks"])
    for k in keys:
        if k in blocks:
            qw = qfn(blocks[k], axis=-2)
            if mode == "w8a8" and k in W8A8_KEYS:
                qw = W8A8Linear(*qw)
            blocks[k] = qw
    out["blocks"] = blocks
    if quantize_head:
        hw = qfn(params["head"]["w"], axis=-2)
        if mode == "w8a8" and act_head:
            hw = W8A8Linear(*hw)
        out["head"] = {"w": hw, "b": params["head"]["b"]}
    return out


def resolve_weight(w, dtype) -> jnp.ndarray:
    """Quantized leaf -> dequantized matrix; plain arrays pass through."""
    if isinstance(w, (QuantizedLinear, W8A8Linear, FP8Linear)):
        return dequantize_weight(w, dtype)
    if isinstance(w, (tuple,)) and len(w) == 2 and hasattr(w[0], "dtype") \
            and w[0].dtype == jnp.int8:
        return dequantize_weight(QuantizedLinear(*w), dtype)
    return w.astype(dtype)


def _as_quantized(w) -> Optional[QuantizedLinear]:
    if isinstance(w, QuantizedLinear):
        return w
    if isinstance(w, tuple) and not isinstance(w, W8A8Linear) and len(w) == 2 \
            and hasattr(w[0], "dtype") and w[0].dtype == jnp.int8:
        return QuantizedLinear(*w)
    return None


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-token INT8: (..., K) -> (int8 values,
    f32 (..., 1) scales). |x|/scale <= 127 by construction, so no clip."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    return jnp.round(x32 / xs).astype(jnp.int8), xs


_FUSED_ACT_QUANT = True


def set_fused_act_quant(on: bool) -> None:
    """Route the decode FFN's fc2 through the fused Pallas
    bias+GELU+per-token-quant kernel (ops/pallas/quantize.py) feeding an
    exact s8 x s8 -> s32 dot, on scales with >= MIN_FUSED_ROWS token rows
    (smaller scales lose the saving to per-call overhead — sweep in
    ops/pallas/quantize.py). Trace-time switch (like set_attention_impl);
    ON by default on TPU — measured 385.8 -> 378.4 ms on the d30 B=16
    W8A8+INT8-KV decode (41.5 -> 42.3 img/s, BENCHMARKS.md round 4). OFF
    falls back to the XLA quantization passes (also used under an active TP
    mesh, where the hidden dim is sharded so per-token amax is not
    shard-local)."""
    global _FUSED_ACT_QUANT
    _FUSED_ACT_QUANT = bool(on)


def fused_act_quant_enabled() -> bool:
    if not _FUSED_ACT_QUANT:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        from sdvar_tpu.ops.partition import pallas_interpret

        if not pallas_interpret():
            return False
    from sdvar_tpu.ops.partition import tp_mesh_active

    return not tp_mesh_active()


def w8a8_prequant_matmul(xq: jnp.ndarray, xs: jnp.ndarray, qw: W8A8Linear,
                         dtype) -> jnp.ndarray:
    """int8 (B, L, K) rows + (B, L, 1) f32 scales @ int8 (K, N).

    Exact s8 x s8 -> s32 dot: as of this round's compiler it lowers to the
    same 2x-rate int8 MXU mode as the convert(int8->bf16) form (measured
    242 vs 245 TFLOP/s on the d30 fc1 shape, tools/microbench_int8_matmul
    .py), and it lets the producer hand over real int8 rows — the point of
    the fused quantization kernel. Numerics: exact integer accumulation
    (strictly tighter than the f32-accum convert form)."""
    acc = jax.lax.dot_general(
        xq, qw.q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return (acc * xs * qw.scale[(None,) * (acc.ndim - 1)]).astype(dtype)


def w8a8_matmul(x_blc: jnp.ndarray, qw: W8A8Linear, dtype) -> jnp.ndarray:
    """(B, L, K) @ int8 (K, N) with per-token activation quantization.

    Both operands feed the MXU as convert(int8 -> bf16) with f32
    accumulation — the pattern XLA lowers to the 2x int8 MXU path (see
    W8A8Linear docstring). Output = acc * act_scale * weight_scale.
    """
    # NOTE: XLA sinks the int8->bf16 convert into the producer fusion and
    # materializes the quantized activation as bf16; forcing int8
    # materialization with an optimization_barrier was measured NEUTRAL
    # (538 vs 533 ms d30 B=16), so leave XLA's choice alone.
    xq, xs = quantize_activation(x_blc)
    acc = jax.lax.dot_general(
        xq.astype(jnp.bfloat16), qw.q.astype(jnp.bfloat16),
        (((x_blc.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * xs * qw.scale[(None,) * (acc.ndim - 1)]).astype(dtype)


def linear_blc(x_blc: jnp.ndarray, w, dtype) -> jnp.ndarray:
    """(B, L, K) @ w -> (B, L, N) with f32 MXU accumulation.

    INT8 weights route through the fused Pallas dequant-matmul on TPU
    (ops/pallas/matmul_int8.py) — int8 stays int8 in HBM; the XLA fallback
    (CPU tests, odd shapes) dequantizes then matmuls. bf16/f32 weights take
    the plain einsum.
    """
    if isinstance(w, W8A8Linear) and w.q.ndim == 2:
        return w8a8_matmul(x_blc, w, dtype)
    qw = _as_quantized(w)
    if qw is not None and qw.q.ndim == 2 and jax.default_backend() in (
            "tpu", "axon"):
        from sdvar_tpu.ops.pallas.matmul_int8 import int8_matmul_blc

        K, N = qw.q.shape
        M = x_blc.shape[0] * x_blc.shape[1]
        # tile-aligned shapes only; odd shapes fall back to XLA dequant
        if K % 128 == 0 and N % 128 == 0 and M % 8 == 0:
            return int8_matmul_blc(x_blc.astype(dtype), qw.q, qw.scale,
                                   out_dtype=dtype)
    # NOTE: flattening tokens to a 2-D (B*L, K) GEMM here was measured WORSE
    # (d30 B=16: 774 vs 738 ms) — XLA emitted convolution kernels for the
    # flattened form and re-introduced cache layout copies. Keep the 3-D
    # einsum.
    return jnp.einsum(
        "blc,ck->blk", x_blc, resolve_weight(w, dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


# ---------------------------------------------------------------------------
# INT8 KV cache
# ---------------------------------------------------------------------------

class QuantizedKVCache(NamedTuple):
    """INT8 KV cache with per-token scales.

    k, v:  int8 (depth, L, B, C)   [token-major merged-head layout,
                                    lane-aligned — see models/var.KVCache]
    k_s, v_s: f32 (depth, B, L)    per-token scales, batch-major so the
                                   Pallas cache kernel can take the whole
                                   (B, L) plane per layer as one block
                                   (ops/pallas/experimental.pallas_attention_cache)
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_s: jnp.ndarray
    v_s: jnp.ndarray

    @staticmethod
    def create(cfg: VARConfig, batch: int, max_len: Optional[int] = None
               ) -> "QuantizedKVCache":
        L = max_len or cfg.L
        C = cfg.num_heads * cfg.head_dim
        return QuantizedKVCache(
            k=jnp.zeros((cfg.depth, L, batch, C), jnp.int8),
            v=jnp.zeros((cfg.depth, L, batch, C), jnp.int8),
            k_s=jnp.ones((cfg.depth, batch, L), jnp.float32),
            v_s=jnp.ones((cfg.depth, batch, L), jnp.float32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[1]


def quantize_tokens(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., C) -> int8 values + (...) per-token scales (amax over C)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_tokens(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
