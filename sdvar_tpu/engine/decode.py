"""Baseline KV-cached CFG decode loop — the minimum end-to-end slice.

Capability parity with ``VAR.autoregressive_infer_cfg``
(reference: models/var.py:127-215): 10 per-scale forwards, classifier-free
guidance by batch doubling with per-scale strength t = cfg*si/(S-1), top-k/
top-p sampling, per-scale quantizer state update, final VQVAE decode.

TPU-first design: the whole scale loop is unrolled inside ONE ``jax.jit``
(static scale schedule), with a preallocated KV cache written at static
offsets. Every shape is static; XLA sees the full 10-scale program and
pipelines quantizer updates against the next scale's transformer entry.

RNG: sampling at scale ``si`` uses ``fold_in(key, si)`` — outputs are
invariant to how the loop is driven (see ops/sampling.py docstring).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.models import quantizer as Q
from sdvar_tpu.models import var as M
from sdvar_tpu.models.var import KVCache
from sdvar_tpu.ops.sampling import (
    cfg_double,
    cfg_mix,
    cfg_pair,
    fold_key,
    gumbel_softmax,
    sample_with_top_k_top_p,
)


class DecodeState(NamedTuple):
    """Carries the decode across scales (also used by the speculative
    engine's stepwise driver)."""

    f_hat: jnp.ndarray          # (B, Cvae, HW, HW) f32
    next_map: jnp.ndarray       # (B, Cvae, pn', pn') continuous input for next scale
    cache: KVCache


def scale_step(
    var_cfg: VARConfig, vae_cfg: VQVAEConfig,
    params, quant_params,
    si: int,
    state: DecodeState,
    sos: jnp.ndarray,            # (2B, C) cond‖uncond class embedding
    lvl_pos: jnp.ndarray,        # (L, C)
    key: jax.Array,
    samp: SamplingConfig,
    dtype=jnp.bfloat16,
    mods=None,
    attn_bias: Optional[jnp.ndarray] = None,
) -> Tuple[DecodeState, jnp.ndarray]:
    """One scale of KV-cached CFG decode. Returns (state', token ids (B, pn^2)).

    ``si`` is static — offsets, shapes and masks are compile-time constants.
    ``mods``: optional precomputed AdaLN modulations (shared across scales).
    ``attn_bias``: optional (pn^2, kv_len) additive bias for this step
    (default None = attend the whole cache, the baseline behavior).
    """
    pn = var_cfg.patch_nums[si]
    bg, ed = var_cfg.begin_ends[si]
    B2 = sos.shape[0]
    B = B2 // 2

    if si == 0:
        x = (sos[:, None, :] + jnp.asarray(params["pos_start"])[None]
             + lvl_pos[None, : var_cfg.first_l]).astype(dtype)
    else:
        nm = state.next_map.reshape(B, var_cfg.Cvae, pn * pn).transpose(0, 2, 1)
        x = M.word_embed(params, nm, jnp.float32) + lvl_pos[None, bg:ed]
        x = cfg_double(x).astype(dtype)  # CFG doubling (shard-local layout)

    # Odd token counts hit a pathological XLA matmul emitter (d30 scale 8:
    # fc2 ran at 38% MFU as (B, 169, K) vs 85% at 256 — profile_decode).
    # Pad queries up to a 64-multiple: pad rows write into the NEXT scale's
    # cache slots, which every later scale fully overwrites before reading
    # (kv_len at this scale stops at `ed`), so numerics are untouched.
    n_tok = x.shape[1]
    pad_to = -(-n_tok // 64) * 64 if n_tok > 128 else n_tok
    pad_to = min(pad_to, state.cache.k.shape[1] - bg)  # k: (depth, L, B, C)
    if pad_to > n_tok:
        x = jnp.pad(x, ((0, 0), (0, pad_to - n_tok), (0, 0)))
        if attn_bias is not None:
            # pad rows attend everything (their output is discarded and
            # their cache slots are overwritten before any read)
            attn_bias = jnp.pad(attn_bias, ((0, pad_to - n_tok), (0, 0)))

    h, cache = M.apply_transformer(
        var_cfg, params, x, sos, attn_bias=attn_bias,
        cache=state.cache, cache_begin=bg, kv_len=ed, mods=mods,
    )
    if pad_to > n_tok:
        h = h[:, :n_tok]
    logits = M.get_logits(var_cfg, params, h, sos)  # (2B, pn^2, V) f32

    ratio = si / var_cfg.num_stages_minus_1
    t = samp.cfg * ratio
    mixed = cfg_mix(logits, t)

    skey = fold_key(key, si)
    ids = sample_with_top_k_top_p(mixed, skey, samp.top_k, samp.top_p)

    if samp.more_smooth:
        # gumbel-softmax mixing of the whole codebook (reference:
        # models/var.py:207-208); visualization only, not for FID.
        gum_t = max(0.27 * (1 - ratio * 0.95), 0.005)
        soft = gumbel_softmax(mixed * (1 + ratio), skey, tau=gum_t)
        h_BlC = jnp.einsum("blv,vc->blc", soft,
                           quant_params["codebook"].astype(jnp.float32))
    else:
        h_BlC = Q.embed(quant_params, ids)

    h_BChw = h_BlC.transpose(0, 2, 1).reshape(B, var_cfg.Cvae, pn, pn)
    f_hat, next_map = Q.next_autoregressive_input(
        vae_cfg, quant_params, si, state.f_hat, h_BChw
    )
    return DecodeState(f_hat=f_hat, next_map=next_map, cache=cache), ids


def init_decode(
    var_cfg: VARConfig, params, label_B: jnp.ndarray, dtype=jnp.bfloat16,
    cache_len: Optional[int] = None, kv_mode: str = "bf16",
    cache=None,
) -> Tuple[DecodeState, jnp.ndarray, jnp.ndarray]:
    """Build (empty state, sos (2B,C), lvl_pos (L,C)) for a batch of labels.

    The uncond row uses class id ``num_classes`` (reference: models/var.py:162).
    ``kv_mode``: "bf16" | "f32" | "int8" (per-token-scaled INT8 KV cache,
    BASELINE.json config #3).
    ``cache``: optional preallocated KV cache to (re)use. Zero-initializing
    a d30 cache costs ~8.5 ms/decode (two 2.5 GB broadcast writes); reuse is
    safe because every scale reads only offsets written earlier in the SAME
    decode (stale rows beyond kv_len are never read, and the full-cache
    Pallas kernel masks its padded rows).
    """
    B = label_B.shape[0]
    label_2B = cfg_pair(label_B,
                        jnp.full_like(label_B, var_cfg.num_classes))
    lvl_pos = M.lvl_pos_embed(var_cfg, params).astype(jnp.float32)
    sos = params["class_emb"][label_2B].astype(jnp.float32)
    HW = var_cfg.patch_nums[-1]
    if cache is None:
        if kv_mode == "int8":
            from sdvar_tpu.ops.quantization import QuantizedKVCache

            cache = QuantizedKVCache.create(var_cfg, 2 * B, max_len=cache_len)
        else:
            cache = KVCache.create(
                var_cfg, 2 * B, max_len=cache_len,
                dtype=jnp.float32 if kv_mode == "f32" else jnp.bfloat16,
            )
    state = DecodeState(
        f_hat=jnp.zeros((B, var_cfg.Cvae, HW, HW), jnp.float32),
        next_map=jnp.zeros((B, var_cfg.Cvae, 1, 1), jnp.float32),
        cache=cache,
    )
    return state, sos, lvl_pos


@functools.partial(
    jax.jit,
    static_argnames=("var_cfg", "vae_cfg", "samp", "dtype", "return_ids",
                     "kv_mode", "return_cache"),
    donate_argnames=("cache",),
)
def decode_all_scales(
    var_cfg: VARConfig, vae_cfg: VQVAEConfig, params, quant_params,
    label_B: jnp.ndarray, key: jax.Array,
    samp: SamplingConfig = SamplingConfig(),
    dtype=jnp.bfloat16,
    return_ids: bool = False,
    kv_mode: str = "bf16",
    cache=None,
    return_cache: bool = False,
):
    """Full 10-scale generation in one compiled program -> f_hat
    (B, Cvae, HW, HW), optionally with the sampled ids (B, L).

    ``cache``: optional preallocated KV cache (DONATED — the caller's handle
    is invalidated; take the returned one via ``return_cache=True``). Reuse
    skips the ~8.5 ms cache zero-init per call and keeps steady-state decode
    allocation-free (serving hot loop)."""
    state, sos, lvl_pos = init_decode(var_cfg, params, label_B, dtype,
                                      kv_mode=kv_mode, cache=cache)
    mods = M.precompute_modulations(var_cfg, params, sos)
    ids_all = []
    for si in range(var_cfg.num_scales):
        state, ids = scale_step(
            var_cfg, vae_cfg, params, quant_params, si, state, sos, lvl_pos,
            key, samp, dtype, mods=mods,
        )
        ids_all.append(ids)
    out = (state.f_hat,)
    if return_ids:
        out += (jnp.concatenate(ids_all, axis=1),)
    if return_cache:
        out += (state.cache,)
    return out if len(out) > 1 else out[0]


def generate_images(
    var_cfg: VARConfig, vae_cfg: VQVAEConfig, var_params, vae_params,
    label_B: jnp.ndarray, key: jax.Array,
    samp: SamplingConfig = SamplingConfig(), dtype=jnp.bfloat16,
):
    """Labels -> images in [0, 1] (reference: models/var.py:215)."""
    from sdvar_tpu.models import vqvae as VQ

    f_hat = decode_all_scales(
        var_cfg, vae_cfg, var_params, vae_params["quant"], label_B, key,
        samp, dtype,
    )
    img = VQ.fhat_to_img(vae_cfg, vae_params, f_hat)
    return (img + 1.0) * 0.5
