"""Multi-scale residual vector quantizer — THE core VAR primitive.

Capability parity with the reference ``VectorQuantizer2``
(reference: models/quant.py:15-243): coarse-to-fine residual quantization over
``patch_nums``; per scale the residual is area-downsampled to (pn, pn),
nearest-codebook looked up (L2 or cosine), the chosen embedding is
bicubic-upsampled to the full grid, refined by a shared/partially-shared
phi conv, accumulated into ``f_hat`` and subtracted from the residual.

TPU-first design: pure functions over a params pytree; resizes are dense
matmul resizes (see ops/resize.py); the nearest-neighbour search is a single
(N, C) @ (C, V) MXU matmul at HIGHEST precision. Static Python loops over the
(static) scale list unroll under jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import VQVAEConfig
from sdvar_tpu.ops.resize import area_resize, bicubic_resize

Params = Dict[str, jnp.ndarray]
HI = jax.lax.Precision.HIGHEST


def init_quantizer_params(cfg: VQVAEConfig, key: jax.Array,
                          eini: float = -1.0) -> Params:
    """Codebook + stacked phi convs.

    Layout:
      codebook: (V, Cvae) f32
      phi_w:    (K, Cvae, Cvae, 3, 3)  (OIHW, torch conv layout)
      phi_b:    (K, Cvae)
    eini < 0 mirrors reference uniform init (models/quant.py:44-46).
    """
    kc, kp = jax.random.split(key)
    V, C, K = cfg.vocab_size, cfg.Cvae, cfg.num_phi
    if eini > 0:
        codebook = jax.random.truncated_normal(kc, -2, 2, (V, C)) * eini
    else:
        lim = abs(eini) / V
        codebook = jax.random.uniform(kc, (V, C), minval=-lim, maxval=lim)
    fan_in = C * 9
    phi_w = jax.random.uniform(
        kp, (K, C, C, 3, 3), minval=-1.0, maxval=1.0
    ) / np.sqrt(fan_in)
    return {
        "codebook": codebook.astype(jnp.float32),
        "phi_w": phi_w.astype(jnp.float32),
        "phi_b": jnp.zeros((K, C), jnp.float32),
    }


def phi_apply(cfg: VQVAEConfig, params: Params, si: int,
              h_BChw: jnp.ndarray) -> jnp.ndarray:
    """phi(h) = (1-r)*h + r*conv3x3(h); phi chosen per scale
    (reference: models/quant.py:199-243)."""
    r = abs(cfg.quant_resi)
    if r < 1e-6:
        return h_BChw
    k = cfg.phi_index(si)
    w = params["phi_w"][k]
    b = params["phi_b"][k]
    y = jax.lax.conv_general_dilated(
        h_BChw.astype(jnp.float32), w,
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=HI,
    ) + b[None, :, None, None]
    return h_BChw * (1.0 - r) + y * r


def lookup_codes(cfg: VQVAEConfig, params: Params,
                 z_NC: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook index per row (N, C) -> (N,) int32.

    L2 (argmin ||z-e||^2) or cosine (argmax norm(z)@norm(E)^T) per
    reference models/quant.py:67-75,151-157.
    """
    E = params["codebook"].astype(jnp.float32)
    z = z_NC.astype(jnp.float32)
    if cfg.using_znorm:
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        En = E / jnp.maximum(jnp.linalg.norm(E, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("nc,vc->nv", zn, En, precision=HI)
        return jnp.argmax(sim, axis=-1).astype(jnp.int32)
    d = (
        jnp.sum(z * z, axis=-1, keepdims=True)
        + jnp.sum(E * E, axis=-1)[None, :]
        - 2.0 * jnp.einsum("nc,vc->nv", z, E, precision=HI)
    )
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def embed(params: Params, idx: jnp.ndarray) -> jnp.ndarray:
    """Codebook gather: (...,) int -> (..., Cvae)."""
    return params["codebook"][idx]


def _upsample_refine(cfg: VQVAEConfig, params: Params, si: int,
                     h_BChw: jnp.ndarray, hw: int) -> jnp.ndarray:
    """Bicubic-upsample a scale's embedding map to the full grid, then phi."""
    if h_BChw.shape[-1] != hw:
        h_BChw = bicubic_resize(h_BChw, (hw, hw))
    return phi_apply(cfg, params, si, h_BChw)


def encode(cfg: VQVAEConfig, params: Params, f_BChw: jnp.ndarray,
           patch_nums: Optional[Sequence[int]] = None,
           return_fhat: bool = False) -> List[jnp.ndarray]:
    """Residual-pyramid encode (reference f_to_idxBl_or_fhat,
    models/quant.py:135-166).

    Returns per-scale token ids (B, pn*pn) int32 — or the running f_hat per
    scale when ``return_fhat``.
    """
    pns = tuple(patch_nums or cfg.patch_nums)
    B, C, H, W = f_BChw.shape
    assert pns[-1] == H == W, (pns, H, W)
    SN = len(pns)
    f_rest = f_BChw.astype(jnp.float32)
    f_hat = jnp.zeros_like(f_rest)
    out = []
    for si, pn in enumerate(pns):
        z = f_rest if si == SN - 1 else area_resize(f_rest, (pn, pn))
        z_NC = z.transpose(0, 2, 3, 1).reshape(-1, C)
        idx_N = lookup_codes(cfg, params, z_NC)
        h = embed(params, idx_N).reshape(B, pn, pn, C).transpose(0, 3, 1, 2)
        h = _upsample_refine(cfg, params, si, h, H)
        f_hat = f_hat + h
        f_rest = f_rest - h
        out.append(f_hat if return_fhat else idx_N.reshape(B, pn * pn))
    return out


def idx_to_var_input(cfg: VQVAEConfig, params: Params,
                     gt_idx_Bl: List[jnp.ndarray]) -> jnp.ndarray:
    """Teacher-forcing input for VAR training (reference idxBl_to_var_input,
    models/quant.py:169-184): per scale si < SN-1, rebuild f_hat from gt ids
    and area-downsample to the NEXT scale; concat over scales -> (B, L-1, C).
    """
    pns = cfg.patch_nums
    B = gt_idx_Bl[0].shape[0]
    C, HW, SN = cfg.Cvae, pns[-1], len(pns)
    f_hat = jnp.zeros((B, C, HW, HW), jnp.float32)
    pieces = []
    for si in range(SN - 1):
        pn = pns[si]
        h = embed(params, gt_idx_Bl[si]).reshape(B, pn, pn, C).transpose(0, 3, 1, 2)
        h = bicubic_resize(h, (HW, HW)) if pn != HW else h
        f_hat = f_hat + phi_apply(cfg, params, si, h)
        nxt = pns[si + 1]
        nmap = area_resize(f_hat, (nxt, nxt))
        pieces.append(nmap.reshape(B, C, nxt * nxt).transpose(0, 2, 1))
    return jnp.concatenate(pieces, axis=1)


def next_autoregressive_input(
    cfg: VQVAEConfig, params: Params, si: int,
    f_hat: jnp.ndarray, h_BChw: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-side per-scale state update (reference
    get_next_autoregressive_input, models/quant.py:187-196).

    h_BChw: (B, C, pn, pn) embedding of the freshly sampled scale.
    Returns (new f_hat, next scale's continuous input map (B, C, pn', pn')).
    """
    pns = cfg.patch_nums
    HW, SN = pns[-1], len(pns)
    if si != SN - 1:
        h = phi_apply(cfg, params, si, bicubic_resize(h_BChw, (HW, HW)))
        f_hat = f_hat + h
        nxt = pns[si + 1]
        return f_hat, area_resize(f_hat, (nxt, nxt))
    h = phi_apply(cfg, params, si, h_BChw)
    f_hat = f_hat + h
    return f_hat, f_hat


def embed_to_fhat(cfg: VQVAEConfig, params: Params,
                  ms_h_BChw: List[jnp.ndarray],
                  last_one: bool = False):
    """Accumulate per-scale embedding maps into f_hat(s)
    (reference embed_to_fhat, models/quant.py:107-121, all_to_max_scale path)."""
    HW = cfg.patch_nums[-1]
    B, C = ms_h_BChw[0].shape[0], cfg.Cvae
    f_hat = jnp.zeros((B, C, HW, HW), jnp.float32)
    outs = []
    for si, h in enumerate(ms_h_BChw):
        f_hat = f_hat + _upsample_refine(cfg, params, si, h, HW)
        if not last_one:
            outs.append(f_hat)
    return f_hat if last_one else outs


def vq_train_forward(
    cfg: VQVAEConfig, params: Params, f_BChw: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """VAE-training quantize pass (reference forward, models/quant.py:52-104).

    Returns (f_hat with straight-through estimator, per-scale hit counts
    (SN, V) for codebook-usage stats, mean vq loss). The EMA update of usage
    stats is the trainer's job (it may psum hit counts across the mesh, the
    reference's async all_reduce at models/quant.py:79-93).
    """
    B, C, H, W = f_BChw.shape
    f = f_BChw.astype(jnp.float32)
    f_ng = jax.lax.stop_gradient(f)
    f_rest = f_ng
    f_hat = jnp.zeros_like(f_ng)
    SN = len(cfg.patch_nums)
    V = cfg.vocab_size
    loss = 0.0
    hits = []
    for si, pn in enumerate(cfg.patch_nums):
        z = f_rest if si == SN - 1 else area_resize(f_rest, (pn, pn))
        z_NC = z.transpose(0, 2, 3, 1).reshape(-1, C)
        idx_N = lookup_codes(cfg, params, z_NC)
        hits.append(jnp.bincount(idx_N, length=V).astype(jnp.float32))
        h = embed(params, idx_N).reshape(B, pn, pn, C).transpose(0, 3, 1, 2)
        h = _upsample_refine(cfg, params, si, h, H)
        f_hat = f_hat + h
        f_rest = f_rest - h
        # commitment + codebook losses (beta-weighted MSE pair, quant.py:95)
        loss = loss + cfg.beta * jnp.mean(
            (jax.lax.stop_gradient(f_hat) - f) ** 2
        ) + jnp.mean((f_hat - f_ng) ** 2)
    loss = loss / SN
    # straight-through: gradients flow to f, values come from f_hat
    f_hat_st = f + jax.lax.stop_gradient(f_hat - f_ng)
    return f_hat_st, jnp.stack(hits), loss


def update_vocab_hit_ema(
    ema_SV: jnp.ndarray, hit_SV: jnp.ndarray, record_hit: jnp.ndarray
) -> jnp.ndarray:
    """EMA codebook-hit tracker (reference: models/quant.py:88-93).

    ``hit_SV`` must already be summed across data-parallel replicas — inside
    a pjit'd step ``jax.lax.psum(hit_SV, "data")`` is the TPU-native
    analogue of the reference's async ``all_reduce`` (quant.py:79), and XLA
    overlaps it with the surrounding compute automatically.
    Blend schedule: step 0 copies, steps <100 use 0.9/0.1, then 0.99/0.01.
    """
    record_hit = jnp.asarray(record_hit)
    warm = ema_SV * 0.9 + hit_SV * 0.1
    slow = ema_SV * 0.99 + hit_SV * 0.01
    return jnp.where(record_hit == 0, hit_SV,
                     jnp.where(record_hit < 100, warm, slow))


def vocab_usage_per_scale(
    cfg: VQVAEConfig, ema_SV: jnp.ndarray,
    batch_tokens: int, world_size: int = 1,
) -> jnp.ndarray:
    """Per-scale % of codebook entries in active use (reference margin rule,
    models/quant.py:100-102): an entry counts as used when its EMA hit count
    clears ``world * B*H*W / V * 0.08``. ``batch_tokens`` = B*H*W of the
    final feature map per replica. Returns (SN,) float32 percentages."""
    margin = world_size * batch_tokens / cfg.vocab_size * 0.08
    return jnp.mean((ema_SV >= margin).astype(jnp.float32), axis=-1) * 100.0
