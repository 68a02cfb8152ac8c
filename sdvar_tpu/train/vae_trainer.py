"""Minimal VQVAE training step — the consumer of the quantizer's EMA
codebook-usage utilities.

The reference trains VAR only (its VQVAE ships pretrained and frozen,
reference: train.py:93-98, models/vqvae.py:51-53), but its quantizer carries
the VAE-training machinery — straight-through forward with commitment loss
(models/quant.py:52-104) and EMA codebook-hit statistics with the
margin-based usage metric (models/quant.py:77-102). This module gives those
producers a first-class consumer: one jitted reconstruction+VQ step that
  - encodes images, runs ``vq_train_forward`` (straight-through f_hat,
    per-scale hit counts, commitment/codebook loss),
  - decodes and takes an L2 reconstruction loss,
  - psums the hit counts over the "data" mesh axis when sharded (the
    TPU-native analogue of the reference's async all_reduce,
    models/quant.py:79-93) — here hit counts are reduced implicitly by
    computing them inside the pjit'd step on the global batch,
  - folds them into the EMA tracker via ``update_vocab_hit_ema`` and
    reports ``vocab_usage_per_scale``.

This is deliberately minimal (SGD, no perceptual/GAN losses): its job is to
keep the VAE-training surface exercised end-to-end, not to reproduce the
upstream VQVAE recipe (which the reference repo does not contain either).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sdvar_tpu.config import VQVAEConfig
from sdvar_tpu.models import quantizer as Q
from sdvar_tpu.models import vqvae as VQ


class VAETrainState(NamedTuple):
    params: Dict
    ema_hits_SV: jnp.ndarray   # (num_scales, vocab) EMA codebook-hit tracker
    step: jnp.ndarray          # int32 scalar ("record_hit" blend schedule)


def init_vae_train_state(cfg: VQVAEConfig, params: Dict) -> VAETrainState:
    SN = len(cfg.patch_nums)
    return VAETrainState(
        params=params,
        ema_hits_SV=jnp.zeros((SN, cfg.vocab_size), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def vae_loss(cfg: VQVAEConfig, params: Dict, img: jnp.ndarray):
    """Reconstruction + VQ loss; returns (loss, (hits_SV, metrics))."""
    f = VQ.img_to_f(cfg, params, img)
    f_hat_st, hits_SV, vq_loss = Q.vq_train_forward(cfg, params["quant"], f)
    rec = VQ.fhat_to_img(cfg, params, f_hat_st)
    rec_loss = jnp.mean((rec - img.astype(jnp.float32)) ** 2)
    loss = rec_loss + vq_loss
    return loss, (hits_SV, {"rec_loss": rec_loss, "vq_loss": vq_loss})


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)
def vae_train_step(
    cfg: VQVAEConfig, state: VAETrainState, img: jnp.ndarray,
    lr: jnp.ndarray,
) -> Tuple[VAETrainState, Dict]:
    """One SGD step; updates params AND the EMA codebook-hit tracker."""
    (loss, (hits_SV, metrics)), grads = jax.value_and_grad(
        lambda p: vae_loss(cfg, p, img), has_aux=True
    )(state.params)
    params = jax.tree.map(lambda p, g: p - lr * g, state.params, grads)
    ema = Q.update_vocab_hit_ema(state.ema_hits_SV, hits_SV, state.step)
    B, H = img.shape[0], cfg.patch_nums[-1]
    usage = Q.vocab_usage_per_scale(cfg, ema, batch_tokens=B * H * H)
    metrics = dict(metrics, loss=loss, usage_per_scale=usage)
    return VAETrainState(params, ema, state.step + 1), metrics
