"""VAR decoder-only transformer over the flattened scale sequence.

Capability parity with the reference ``VAR`` module (reference:
models/var.py:22-314) and its AdaLN blocks (models/basic_var.py:33-174):
word-embed linear over continuous VQ features, class embedding "sos", learned
absolute position + level embeddings, pre-norm blocks with adaptive-LayerNorm
conditioning (6 modulations per block), optional shared AdaLN, optional
L2-normalized QK attention with learned clamped per-head scale, AdaLN-before-
head classifier.

TPU-first design: parameters are a pytree with all per-layer tensors stacked
on a leading ``depth`` axis, and the block stack is applied with
``jax.lax.scan`` — one traced block body regardless of depth, which keeps
compile time flat and lets XLA pipeline layer-by-layer HBM prefetch. The KV
cache is a preallocated static-shape array written at static offsets (the
scale schedule is static), replacing the reference's per-step torch.cat
(basic_var.py:107-109) which XLA cannot compile to a fixed buffer.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import VARConfig

Params = Dict
HI = jax.lax.Precision.HIGHEST


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache.

    k, v: (depth, L_max, B, H*hd) — heads merged into the trailing dim so the
    last axis is a multiple of the 128-lane tile (a trailing head_dim of 64
    would double HBM footprint via lane padding), and the TOKEN axis ahead of
    batch: XLA's layout assignment for the per-scale decode loops prefers
    batch-minor ({3,1,2,0} on a (depth,B,L,C) array) for some query sizes
    and token-minor for others, which inserted full-cache layout copies at
    scale boundaries (6 x ~8 ms at d30 B=16 — see tools/profile_decode.py);
    storing token-major makes the preferred layout THE natural layout for
    every consumer. The decode engine tracks the valid length statically
    (scale schedule is static), so "rollback" after a rejected speculative
    window is just not advancing the write offset.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @staticmethod
    def create(cfg: VARConfig, batch: int, max_len: Optional[int] = None,
               dtype=jnp.bfloat16) -> "KVCache":
        L = max_len or cfg.L
        shape = (cfg.depth, L, batch, cfg.num_heads * cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[1]


# ---------------------------------------------------------------------------
# Initialization (mirrors reference init_weights, models/var.py:261-311,
# with build_vae_var defaults init_adaln=0.5, init_adaln_gamma=1e-5,
# init_head=0.02, init_std=-1 -> sqrt(1/C/3); models/__init__.py:24)
# ---------------------------------------------------------------------------

def init_var_params(
    cfg: VARConfig, key: jax.Array,
    init_adaln: float = 0.5, init_adaln_gamma: float = 1e-5,
    init_head: float = 0.02, init_std: float = -1.0,
    dtype=jnp.float32,
) -> Params:
    C, D, V = cfg.embed_dim, cfg.cond_dim, cfg.vocab_size
    H, hd, depth = cfg.num_heads, cfg.head_dim, cfg.depth
    hidden = cfg.mlp_hidden
    std = math.sqrt(1 / C / 3) if init_std < 0 else init_std

    keys = iter(jax.random.split(key, 32))

    def tn(shape, s=std):
        # torch trunc_normal_ bounds are +/-2 in value space; at s ~ 0.02-0.05
        # that is >40 sigma, i.e. an ordinary normal. Clip for exactness.
        # Cast per-leaf at creation so bf16 init never materializes the full
        # f32 tree (d30 is 2B params).
        return jnp.clip(
            jax.random.normal(next(keys), shape) * s, -2.0, 2.0
        ).astype(dtype)

    blocks = {
        "qkv_w": tn((depth, C, 3 * C)),
        "q_bias": jnp.zeros((depth, C)),
        "v_bias": jnp.zeros((depth, C)),
        "proj_w": tn((depth, C, C)) / math.sqrt(2 * depth),
        "proj_b": jnp.zeros((depth, C)),
        "fc1_w": tn((depth, C, hidden)),
        "fc1_b": jnp.zeros((depth, hidden)),
        "fc2_w": tn((depth, hidden, C)) / math.sqrt(2 * depth),
        "fc2_b": jnp.zeros((depth, C)),
    }
    if cfg.attn_l2_norm:
        blocks["scale_mul"] = jnp.full((depth, H), math.log(4.0))
    if cfg.shared_aln:
        # per-block learned offsets on top of a single shared AdaLN linear
        # (reference: models/basic_var.py:143-144, models/var.py:81)
        gss = jax.random.normal(next(keys), (depth, 1, 6, C)) / math.sqrt(C)
        gss = gss.at[:, :, 2:].multiply(init_adaln)
        gss = gss.at[:, :, :2].multiply(init_adaln_gamma)
        blocks["ada_gss"] = gss
    else:
        w = tn((depth, D, 6 * C))
        w = w.at[:, :, 2 * C:].multiply(init_adaln)
        w = w.at[:, :, : 2 * C].multiply(init_adaln_gamma)
        blocks["ada_lin_w"] = w
        blocks["ada_lin_b"] = jnp.zeros((depth, 6 * C))

    params = {
        "word_embed": {"w": tn((cfg.Cvae, C)), "b": jnp.zeros((C,))},
        "class_emb": tn((cfg.num_classes + 1, C)),
        "pos_start": tn((cfg.first_l, C)),
        "pos_1LC": tn((cfg.L, C)),
        "lvl_embed": tn((cfg.num_scales, C)),
        "blocks": blocks,
        "head_nm": {"w": tn((D, 2 * C)) * init_adaln, "b": jnp.zeros((2 * C,))},
        "head": {"w": tn((C, V)) * init_head, "b": jnp.zeros((V,))},
    }
    if cfg.shared_aln:
        params["shared_ada_lin"] = {"w": tn((D, 6 * C)), "b": jnp.zeros((6 * C,))}
    return jax.tree.map(lambda a: a.astype(dtype), params)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _ln(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm without affine (reference ln_wo_grad,
    models/basic_var.py:141)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, 1e-12)).astype(x.dtype)


def _l2norm_heads(x_blc: jnp.ndarray, H: int, hd: int,
                  rmul: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-head L2 normalization on the MERGED-head (B, L, C) layout.

    Equivalent to ``_l2norm`` on the (B, L, H, hd) view (torch
    F.normalize(dim=-1), eps=1e-12 — reference: models/basic_var.py:101-105)
    but BOTH the reduce and the broadcast-back go through an MXU matmul
    against a (C, H) 0/1 segment mask instead of 4-D axis ops: the axis
    reduce makes XLA pick a reduction-friendly layout that conflicts with
    the surrounding matmuls' and insert full-tensor f32 layout copies
    (~22 ms/decode at d30 B=16 — profile_decode), and ``jnp.repeat`` of the
    reciprocals lowers to a {1,3,2,0}-layout (B, L, H, hd) broadcast plus a
    full f32 relayout copy per layer (another ~14 ms/scale at d30 scale 9).
    Every op here stays on the (B, L, C) row-major layout.

    1/max(||x||, 1e-12) == rsqrt(max(||x||^2, 1e-24)) exactly (sqrt/max
    commute; both monotone). ``rmul``: optional per-head (H,) factor folded
    into the reciprocal (the learned attention scale — basic_var.py:103).
    """
    x32 = x_blc.astype(jnp.float32)
    seg = jnp.repeat(jnp.eye(H, dtype=jnp.float32), hd, axis=0)  # (C, H)
    ss = jax.lax.dot_general(
        x32 * x32, seg, (((x32.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, L, H)
    r = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))
    if rmul is not None:
        r = r * rmul
    # expand (B, L, H) -> (B, L, C) by contracting against seg's H axis:
    # r_full[b, l, c] = r[b, l, head(c)], emitted directly in row-major
    # (B, L, C) layout (0.9 GFLOP at d30 scale 9 — noise on the MXU).
    r_full = jax.lax.dot_general(
        r, seg, (((x32.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (x32 * r_full).astype(x_blc.dtype)


def cond_six(cfg: VARConfig, params: Params, cond_BD: jnp.ndarray,
             dtype=jnp.float32) -> jnp.ndarray:
    """Precompute the shared part of AdaLN conditioning.

    Non-shared: returns silu(cond) (B, D) — each block applies its own linear.
    Shared: returns the (B, 1, 6, C) shared projection; blocks add ada_gss.
    (reference: models/basic_var.py:152-156, models/var.py:16-19,81)
    """
    c = jax.nn.silu(cond_BD.astype(jnp.float32))
    if cfg.shared_aln:
        sal = params["shared_ada_lin"]
        g = jnp.einsum("bd,dk->bk", c, sal["w"].astype(jnp.float32),
                       preferred_element_type=jnp.float32) + sal["b"]
        return g.reshape(-1, 1, 6, cfg.embed_dim).astype(dtype)
    return c.astype(dtype)


def precompute_modulations(cfg: VARConfig, params: Params,
                           cond_BD: jnp.ndarray) -> jnp.ndarray:
    """All-layer AdaLN modulations, (depth, B, 6, C) f32.

    The modulations are a function of the class conditioning ONLY, so the
    decode engine computes them once per generation instead of re-running
    the (D -> 6C) projection in every layer of every scale (the reference
    recomputes per block per forward: models/basic_var.py:152-156).
    lax.map keeps the dequant transient per-layer when ada_lin_w is INT8.
    """
    C = cfg.embed_dim
    cond_pre = cond_six(cfg, params, cond_BD, jnp.float32)
    if cfg.shared_aln:
        # cond_pre (B, 1, 6, C); ada_gss (depth, 1, 6, C)
        return (cond_pre[None, :, 0] +
                params["blocks"]["ada_gss"][:, :1].astype(jnp.float32))

    from sdvar_tpu.ops.quantization import resolve_weight

    def one(wb):
        w, b = wb
        six = jnp.einsum(
            "bd,dk->bk", cond_pre, resolve_weight(w, jnp.float32),
            preferred_element_type=jnp.float32,
        ) + b
        return six.reshape(-1, 6, C)

    return jax.lax.map(
        one, (params["blocks"]["ada_lin_w"], params["blocks"]["ada_lin_b"])
    )


def _block_modulations(cfg: VARConfig, layer: Dict, cond_pre: jnp.ndarray):
    """Per-block (gamma1, gamma2, scale1, scale2, shift1, shift2), each
    (B, 1, C)."""
    C = cfg.embed_dim
    if cfg.shared_aln:
        six = (cond_pre + layer["ada_gss"][None]).astype(jnp.float32)
    else:
        from sdvar_tpu.ops.quantization import resolve_weight

        six = jnp.einsum(
            "bd,dk->bk", cond_pre.astype(jnp.float32),
            resolve_weight(layer["ada_lin_w"], jnp.float32),
            preferred_element_type=jnp.float32,
        ) + layer["ada_lin_b"]
        six = six.reshape(-1, 1, 6, C)
    return [six[:, :, i, :] for i in range(6)]


def _attention(
    cfg: VARConfig, layer: Dict, x: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray],
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_begin: int, kv_len: int,
    layer_idx=None,
):
    """Self-attention for one block.

    Without cache: keys/values are the current tokens (training / prefill
    without reuse). With cache: cache_kv is the FULL (depth, L_max, B, C)
    pair (token-major — see KVCache); this layer's new KV are written in
    place at [layer_idx, cache_begin:..., :) and attention reads keys
    [0, kv_len) — offsets static, layer index traced (scan carry).

    Returns (out, updated (ck, cv) or None).
    reference: models/basic_var.py:58-125.
    """
    B, L, C = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    qkv_bias = jnp.concatenate(
        [layer["q_bias"], jnp.zeros_like(layer["q_bias"]), layer["v_bias"]]
    ).astype(x.dtype)
    from sdvar_tpu.ops.quantization import linear_blc

    qkv = linear_blc(x, layer["qkv_w"], x.dtype) + qkv_bias
    qm, km, vm = jnp.split(qkv, 3, axis=-1)  # (B, L, C) merged heads

    if cfg.attn_l2_norm:
        scale = 1.0
        smul = jnp.exp(
            jnp.minimum(layer["scale_mul"].astype(jnp.float32), math.log(100.0))
        )  # (H,)
        qm = _l2norm_heads(qm, H, hd, rmul=smul)
        km = _l2norm_heads(km, H, hd)
    else:
        scale = 0.25 / math.sqrt(hd)
    q, k, v = (a.reshape(B, L, H, hd) for a in (qm, km, vm))

    from sdvar_tpu.ops.attention import attention as _attn_dispatch
    from sdvar_tpu.ops.attention import use_cache_kernel

    new_cache = None
    kv_token_major = False
    kv_scales = None
    out = None
    if cache_kv is not None and len(cache_kv) == 4:
        # INT8 KV cache with per-token scales (ops/quantization.py);
        # values token-major (depth, L_max, B, C), scales batch-major
        # (depth, B, L_max). Dequant happens INSIDE the attention kernel.
        from sdvar_tpu.ops.quantization import quantize_tokens

        ck, cv, cks, cvs = cache_kv
        kq, kts = quantize_tokens(k.reshape(B, L, C).transpose(1, 0, 2))
        vq, vts = quantize_tokens(v.reshape(B, L, C).transpose(1, 0, 2))
        if use_cache_kernel():
            # in-kernel cache write: new KV (and scales) are DMA'd into the
            # cache inside the kernel; the cache is aliased through the
            # call, so the scan carry keeps one buffer (no XLA DUS, no
            # copied custom-call operand)
            from sdvar_tpu.ops.pallas.experimental import (
                pallas_attention_cache_write,
            )

            res = pallas_attention_cache_write(
                q, kq, vq, ck, cv, layer_idx, cache_begin, kv_len,
                attn_bias, scale,
                new_scales=(kts.T, vts.T), cache_scales=(cks, cvs),
            )
            if res is not None:
                out, ck, cv, cks, cvs = res
                new_cache = (ck, cv, cks, cvs)
        if out is None:
            ck = jax.lax.dynamic_update_slice(ck, kq[None], (layer_idx, cache_begin, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vq[None], (layer_idx, cache_begin, 0, 0))
            cks = jax.lax.dynamic_update_slice(cks, kts.T[None], (layer_idx, 0, cache_begin))
            cvs = jax.lax.dynamic_update_slice(cvs, vts.T[None], (layer_idx, 0, cache_begin))
            new_cache = (ck, cv, cks, cvs)
            ks = jax.lax.dynamic_slice(ck, (layer_idx, 0, 0, 0), (1, kv_len, B, C))[0]
            vs = jax.lax.dynamic_slice(cv, (layer_idx, 0, 0, 0), (1, kv_len, B, C))[0]
            kss = jax.lax.dynamic_slice(cks, (layer_idx, 0, 0), (1, B, kv_len))[0]
            vss = jax.lax.dynamic_slice(cvs, (layer_idx, 0, 0), (1, B, kv_len))[0]
            k = ks.reshape(kv_len, B, H, hd)
            v = vs.reshape(kv_len, B, H, hd)
            kv_scales = (kss.T, vss.T)
            kv_token_major = True
    elif cache_kv is not None:
        ck, cv = cache_kv  # (depth, L_max, B, C) token-major merged heads
        km = k.reshape(B, L, C).transpose(1, 0, 2).astype(ck.dtype)
        vm = v.reshape(B, L, C).transpose(1, 0, 2).astype(cv.dtype)
        if use_cache_kernel():
            from sdvar_tpu.ops.pallas.experimental import (
                pallas_attention_cache_write,
            )

            res = pallas_attention_cache_write(
                q.astype(x.dtype), km, vm, ck, cv, layer_idx,
                cache_begin, kv_len, attn_bias, scale,
            )
            if res is not None:
                out, ck, cv = res
                new_cache = (ck, cv)
        if out is None:
            ck = jax.lax.dynamic_update_slice(ck, km[None], (layer_idx, cache_begin, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vm[None], (layer_idx, cache_begin, 0, 0))
            new_cache = (ck, cv)
            ks = jax.lax.dynamic_slice(
                ck, (layer_idx, 0, 0, 0), (1, kv_len, B, C)
            )[0]
            vs = jax.lax.dynamic_slice(
                cv, (layer_idx, 0, 0, 0), (1, kv_len, B, C)
            )[0]
            k = ks.reshape(kv_len, B, H, hd).astype(x.dtype)
            v = vs.reshape(kv_len, B, H, hd).astype(x.dtype)
            kv_token_major = True

    if out is None:
        out = _attn_dispatch(q, k, v, attn_bias, scale,
                             kv_token_major=kv_token_major,
                             kv_scales=kv_scales)
    out = out.reshape(B, L, C)
    out = linear_blc(out, layer["proj_w"], x.dtype) \
        + layer["proj_b"].astype(x.dtype)
    return out, new_cache


def _ffn(cfg: VARConfig, layer: Dict, x: jnp.ndarray) -> jnp.ndarray:
    from sdvar_tpu.ops.quantization import (
        W8A8Linear,
        fused_act_quant_enabled,
        linear_blc,
        w8a8_prequant_matmul,
    )

    fc2 = layer["fc2_w"]
    if (isinstance(fc2, W8A8Linear) and fc2.q.ndim == 2
            and fused_act_quant_enabled()):
        from sdvar_tpu.ops.pallas import quantize as plq
        from sdvar_tpu.ops.partition import pallas_interpret

        h = linear_blc(x, layer["fc1_w"], x.dtype)  # bias folded into kernel
        if plq.eligible(h, min_rows=plq.MIN_FUSED_ROWS):
            # fused bias + GELU + per-token int8 in one Pallas pass, exact
            # s8 dot for fc2 — kills the XLA amax/round passes over the 4C
            # activation (the decode's last per-scale slack, BENCHMARKS.md)
            hq, hs = plq.act_quantize(h, layer["fc1_b"], gelu=True,
                                      interpret=pallas_interpret())
            return w8a8_prequant_matmul(hq, hs, fc2, x.dtype) \
                + layer["fc2_b"].astype(x.dtype)
        h = h + layer["fc1_b"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=True)
        return linear_blc(h, fc2, x.dtype) + layer["fc2_b"].astype(x.dtype)

    h = linear_blc(x, layer["fc1_w"], x.dtype) + layer["fc1_b"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)  # GELU(tanh), basic_var.py:40
    h = linear_blc(h, layer["fc2_w"], x.dtype) + layer["fc2_b"].astype(x.dtype)
    return h


def apply_transformer(
    cfg: VARConfig, params: Params, x: jnp.ndarray, cond_BD: jnp.ndarray,
    attn_bias: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    cache_begin: int = 0, kv_len: int = 0,
    drop_path_key: Optional[jax.Array] = None,
    mods: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the block stack via lax.scan over stacked layer params.

    ``remat``: rematerialize each layer in the backward pass
    (jax.checkpoint over the scan body) — activation memory drops from
    O(depth) to O(1) layers at ~1/3 extra FLOPs, the standard trade for
    training d30/d36 at production batch sizes (the reference leans on
    smaller per-GPU batches instead).

    x: (B, L, C) in compute dtype; cond_BD: (B, D) raw class embedding.
    attn_bias: optional (Lq, Lk) additive bias, shared across batch/heads.
    cache: optional KVCache; new tokens written at cache_begin, attention
    over keys [0, kv_len).
    drop_path_key: enables stochastic depth (training) with per-layer rates
    linspace(0, cfg.dpr, depth) (reference: models/var.py:85).
    mods: optional precomputed (depth, B, 6, C) AdaLN modulations
    (precompute_modulations) — the decode engine shares one copy across all
    scales instead of re-projecting per layer per scale.
    """
    if mods is None:
        cond_pre = cond_six(cfg, params, cond_BD, dtype=jnp.float32)
    depth = cfg.depth
    training = drop_path_key is not None
    dpr = jnp.linspace(0.0, cfg.dpr, depth) if (training and cfg.dpr > 0) \
        else None
    # proj/FFN-output dropout (reference: basic_var.py proj_drop / FFN drop)
    do_drop = training and cfg.drop_rate > 0

    def _dropout(t, key, fold):
        keep = jax.random.bernoulli(
            jax.random.fold_in(key, fold), 1.0 - cfg.drop_rate, t.shape)
        return t * keep.astype(t.dtype) / jnp.asarray(
            1.0 - cfg.drop_rate, t.dtype)

    quantized_cache = cache is not None and hasattr(cache, "k_s")

    def body(carry, inp):
        layer, li, mod_l = inp
        if cache is not None:
            h, *cache_arrs = carry
            cache_tuple = tuple(cache_arrs)
        else:
            h = carry
            cache_tuple = None
        if mod_l is not None:
            g1, g2, s1, s2, sh1, sh2 = [mod_l[:, None, i] for i in range(6)]
        else:
            g1, g2, s1, s2, sh1, sh2 = _block_modulations(cfg, layer, cond_pre)
        g1, g2, s1, s2, sh1, sh2 = [t.astype(h.dtype) for t in (g1, g2, s1, s2, sh1, sh2)]

        a_in = _ln(h, cfg.norm_eps) * (1.0 + s1) + sh1
        a_out, new_cache = _attention(
            cfg, layer, a_in, attn_bias,
            cache_tuple, cache_begin, kv_len,
            layer_idx=li,
        )
        if do_drop:
            a_out = _dropout(a_out, jax.random.fold_in(drop_path_key, li),
                             0xD0A)
        a_out = a_out * g1
        if dpr is not None:
            rate = dpr[li]
            bkey = jax.random.fold_in(drop_path_key, 2 * li)
            keep = jax.random.bernoulli(bkey, 1.0 - rate, (h.shape[0], 1, 1))
            a_out = a_out * keep.astype(h.dtype) / jnp.maximum(1.0 - rate, 1e-6).astype(h.dtype)
        h = h + a_out

        f_in = _ln(h, cfg.norm_eps) * (1.0 + s2) + sh2
        f_out = _ffn(cfg, layer, f_in)
        if do_drop:
            f_out = _dropout(f_out, jax.random.fold_in(drop_path_key, li),
                             0xD0F)
        f_out = f_out * g2
        if dpr is not None:
            rate = dpr[li]
            bkey = jax.random.fold_in(drop_path_key, 2 * li + 1)
            keep = jax.random.bernoulli(bkey, 1.0 - rate, (h.shape[0], 1, 1))
            f_out = f_out * keep.astype(h.dtype) / jnp.maximum(1.0 - rate, 1e-6).astype(h.dtype)
        h = h + f_out

        if cache is not None:
            return (h,) + tuple(new_cache), None
        return h, None

    li = jnp.arange(depth)
    xs = (params["blocks"], li, mods)  # a None mods leaf scans as None
    if remat and cache is None:
        body = jax.checkpoint(body, prevent_cse=False)
    if cache is not None:
        # cache rides the CARRY (same buffer updated in place layer by
        # layer), not the scan ys — ys would allocate a second full cache.
        init = (x,) + tuple(cache)
        out_carry, _ = jax.lax.scan(body, init, xs)
        x = out_carry[0]
        if quantized_cache:
            from sdvar_tpu.ops.quantization import QuantizedKVCache

            return x, QuantizedKVCache(*out_carry[1:])
        return x, KVCache(*out_carry[1:])
    x, _ = jax.lax.scan(body, x, xs)
    return x, None


def get_logits(cfg: VARConfig, params: Params, h: jnp.ndarray,
               cond_BD: jnp.ndarray) -> jnp.ndarray:
    """AdaLN-before-head + classifier, always f32
    (reference: models/var.py:119-125, models/basic_var.py:165-174)."""
    C = cfg.embed_dim
    hn = params["head_nm"]
    ss = jnp.einsum(
        "bd,dk->bk", jax.nn.silu(cond_BD.astype(jnp.float32)),
        hn["w"].astype(jnp.float32), preferred_element_type=jnp.float32,
    ) + hn["b"]
    ss = ss.reshape(-1, 1, 2, C)
    scale, shift = ss[:, :, 0, :], ss[:, :, 1, :]
    from sdvar_tpu.ops.quantization import linear_blc

    h32 = _ln(h.astype(jnp.float32), cfg.norm_eps) * (scale + 1.0) + shift
    return linear_blc(h32, params["head"]["w"], jnp.float32) \
        + params["head"]["b"]


def word_embed(params: Params, x_BLCv: jnp.ndarray, dtype) -> jnp.ndarray:
    we = params["word_embed"]
    y = jnp.einsum(
        "blc,ck->blk", x_BLCv.astype(jnp.float32), we["w"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) + we["b"]
    return y.astype(dtype)


def lvl_pos_embed(cfg: VARConfig, params: Params) -> jnp.ndarray:
    """Level embedding broadcast over each scale's tokens + absolute pos,
    (L, C) (reference lvl_pos, models/var.py:164)."""
    lvl_1L = np.concatenate(
        [np.full(pn * pn, i) for i, pn in enumerate(cfg.patch_nums)]
    )
    return params["lvl_embed"][lvl_1L] + params["pos_1LC"]


def sos_map(cfg: VARConfig, params: Params, label_2B: jnp.ndarray,
            lvl_pos: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-scale input map from class embeddings.

    label_2B already contains [cond ‖ uncond] rows for CFG.
    Returns (cond_BD (2B, D), first token map (2B, first_l, C)).
    (reference: models/var.py:162,178-183)
    """
    sos = params["class_emb"][label_2B]  # (2B, C)
    first = (
        sos[:, None, :]
        + params["pos_start"][None]
        + lvl_pos[None, : cfg.first_l]
    )
    return sos, first.astype(dtype)


def var_train_forward(
    cfg: VARConfig, params: Params, label_B: jnp.ndarray,
    x_BLCv_wo_first_l: jnp.ndarray,
    train_key: Optional[jax.Array] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    prog_si: int = -1,
    remat: bool = False,
) -> jnp.ndarray:
    """Teacher-forcing forward -> logits (B, L', V)
    (reference: models/var.py:217-259).

    When ``train_key`` is given, applies conditional-embedding dropout
    (cond_drop_rate) and stochastic depth; otherwise runs deterministically.
    ``attn_bias`` defaults to the block-causal training mask.
    ``prog_si`` >= 0 enables progressive training: the sequence (and mask)
    truncate at begin_ends[prog_si][1] (reference: models/var.py:223,232-234);
    prog_si is static, so each stage compiles once.
    """
    from sdvar_tpu.ops.masks import block_causal_bias

    B = x_BLCv_wo_first_l.shape[0]
    ed = cfg.L if prog_si < 0 else cfg.begin_ends[prog_si][1]
    if train_key is not None and cfg.cond_drop_rate > 0:
        ck = jax.random.fold_in(train_key, 0xC0DE)
        drop = jax.random.uniform(ck, (B,)) < cfg.cond_drop_rate
        label_B = jnp.where(drop, cfg.num_classes, label_B)

    sos = params["class_emb"][label_B]  # (B, C)
    first = sos[:, None, :] + params["pos_start"][None]  # (B, first_l, C)
    if ed > cfg.first_l:
        we = word_embed(
            params, x_BLCv_wo_first_l[:, : ed - cfg.first_l], jnp.float32
        )
        x = jnp.concatenate([first, we], axis=1)
    else:
        x = first
    x = (x + lvl_pos_embed(cfg, params)[None, :ed]).astype(dtype)

    if attn_bias is None:
        attn_bias = jnp.asarray(block_causal_bias(cfg.patch_nums))[:ed, :ed]
    dp_key = None
    if train_key is not None and (cfg.dpr > 0 or cfg.drop_rate > 0):
        dp_key = jax.random.fold_in(train_key, 0xD80)
    h, _ = apply_transformer(cfg, params, x, sos, attn_bias=attn_bias,
                             drop_path_key=dp_key, remat=remat)
    return get_logits(cfg, params, h, sos)


def count_params(params: Params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
