"""Training orchestration: the VARTrainer equivalent.

Capability parity with the reference trainer (reference: trainer.py:20-201) and
AMP/optimizer wrapper (utils/amp_sc.py:15-88):
  - per step: frozen VQVAE encodes images -> gt token ids (trainer.py:105),
    teacher-forcing input via the quantizer (trainer.py:107), VAR forward,
    token-weighted CE (uniform 1/L; progressive reweighting hook), grad clip,
    AdamW(betas=(0.9, 0.95)) with decoupled weight decay and the reference's
    no-decay param groups (train.py:110-120, utils/lr_control.py:68-108);
  - eval: mean/tail CE + accuracy, psum-reduced across the mesh
    (trainer.py:54-84).

TPU-first: the whole step (tokenize -> forward -> backward -> update) is one
jitted program; gradient accumulation is a ``lax.scan`` over micro-batches
inside the step (mathematically the reference's ac-step accumulation,
amp_sc.py:39-75, without host round-trips); bf16 compute needs no GradScaler.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sdvar_tpu.config import TrainConfig, VARConfig, VQVAEConfig
from sdvar_tpu.models import quantizer as Q
from sdvar_tpu.models import vqvae as VQ
from sdvar_tpu.models.var import var_train_forward
from sdvar_tpu.train.schedule import NOWD_KEYS


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def decay_mask(params: Dict) -> Dict:
    """True where weight decay applies: ndim>1 tensors that are not biases
    and not in the reference's no-decay key set
    (utils/lr_control.py:85-88, train.py:110-116)."""

    def leaf_rule(path, a) -> bool:
        names = [getattr(p, "key", str(p)) for p in path]
        name = "/".join(str(n) for n in names)
        leaf = names[-1]
        if a.ndim <= 1 or str(leaf) in ("b",) or "bias" in name or str(leaf).endswith("_b"):
            return False
        return not any(k in name for k in NOWD_KEYS)

    return jax.tree_util.tree_map_with_path(leaf_rule, params)


def make_optimizer(clip: float = 2.0,
                   kind: str = "adamw") -> optax.GradientTransformation:
    """clip -> {adam(0.9, 0.95) | factored-rms}. lr and decoupled wd are
    applied manually in the step so the schedule (train/schedule.py) stays
    a traced scalar.

    ``kind="adafactor"`` uses factored second moments and no first moment
    (optax.scale_by_factored_rms) — optimizer state drops from 2x params to
    ~O(rows+cols), which is what lets d30 (2B params) TRAIN on one 16 GB
    chip: AdamW needs params+m+v = 12.1 GB in bf16 before grads and
    activations and OOMs even at B=2 (measured — BENCHMARKS.md training
    table). The reference has no analogue (AdamW on multi-GPU only,
    train.py:117-120); multi-chip AdamW stays available via the mesh
    (moments inherit the param shardings)."""
    assert kind in ("adamw", "adafactor"), kind
    scale = (optax.scale_by_factored_rms() if kind == "adafactor"
             else optax.scale_by_adam(b1=0.9, b2=0.95))
    return optax.chain(
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        scale,
    )


def init_train_state(var_params: Dict, clip: float = 2.0,
                     optimizer: str = "adamw") -> TrainState:
    tx = make_optimizer(clip, optimizer)
    return TrainState(
        params=var_params,
        opt_state=tx.init(var_params),
        step=jnp.zeros((), jnp.int32),
    )


def _ce_with_smoothing(logits: jnp.ndarray, labels: jnp.ndarray,
                       smooth: float) -> jnp.ndarray:
    """Per-token CE with label smoothing (torch semantics), (B, L)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if smooth > 0:
        uniform = -jnp.mean(logp, axis=-1)
        nll = (1.0 - smooth) * nll + smooth * uniform
    return nll


def loss_and_metrics(
    var_cfg: VARConfig, params: Dict,
    label_B: jnp.ndarray, x_in: jnp.ndarray, gt_BL: jnp.ndarray,
    train_key: Optional[jax.Array], label_smooth: float,
    loss_weight: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
    prog_si: int = -1,
    prog_wp: float | jnp.ndarray = 1.0,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Token-weighted CE (reference: trainer.py:112-120) + logging metrics.

    Progressive training (prog_si >= 0): the forward truncates at
    begin_ends[prog_si][1] and the current stage's token weights are scaled
    by the stage-warmup factor ``prog_wp`` (reference: trainer.py:113-117).
    """
    L = var_cfg.L
    logits = var_train_forward(var_cfg, params, label_B, x_in,
                               train_key=train_key, dtype=dtype,
                               prog_si=prog_si, remat=remat)
    ed = L if prog_si < 0 else var_cfg.begin_ends[prog_si][1]
    gt = gt_BL[:, :ed]
    ce = _ce_with_smoothing(logits, gt, label_smooth)  # (B, ed)
    lw = loss_weight if loss_weight is not None else jnp.full((L,), 1.0 / L)
    lw = lw[:ed]
    if prog_si >= 0:
        bg = var_cfg.begin_ends[prog_si][0]
        lw = lw.at[bg:ed].multiply(jnp.clip(prog_wp, 0.0, 1.0))
    loss = jnp.mean(jnp.sum(ce * lw[None], axis=-1))

    last_l = var_cfg.patch_nums[-1] ** 2
    pred = jnp.argmax(logits, axis=-1)
    ce_plain = _ce_with_smoothing(logits, gt, 0.0)
    full = prog_si < 0 or ed == L
    # codebook-usage: fraction of vocab entries the model actually predicts
    # (reference z_voc_usage, trainer.py:139-143)
    V = var_cfg.vocab_size
    counts = jnp.bincount(pred.reshape(-1), length=V).astype(jnp.float32)
    usage = jnp.mean(
        (counts / jnp.maximum(counts.sum(), 1.0) > 0.001 / V)
        .astype(jnp.float32)
    ) * 100.0
    metrics = {
        "Lm": jnp.mean(ce_plain),
        "Lt": jnp.mean(ce_plain[:, -last_l:]) if full else jnp.float32(-1),
        "Accm": jnp.mean((pred == gt).astype(jnp.float32)) * 100.0,
        "Acct": (jnp.mean((pred[:, -last_l:] == gt[:, -last_l:])
                          .astype(jnp.float32)) * 100.0
                 if full else jnp.float32(-1)),
        "z_voc_usage": usage,
    }
    return loss, metrics


@functools.partial(
    jax.jit,
    static_argnames=("var_cfg", "vae_cfg", "clip", "label_smooth",
                     "grad_accum", "dtype", "prog_si", "remat",
                     "tokenize_bf16", "optimizer", "pretokenized"),
    donate_argnames=("state",),
)
def train_step(
    var_cfg: VARConfig, vae_cfg: VQVAEConfig,
    state: TrainState, vae_params: Dict,
    img: jnp.ndarray, label_B: jnp.ndarray,
    lr: jnp.ndarray, wd: jnp.ndarray, step_key: jax.Array,
    clip: float = 2.0, label_smooth: float = 0.0,
    grad_accum: int = 1, dtype=jnp.bfloat16,
    prog_si: int = -1, prog_wp: float | jnp.ndarray = 1.0,
    remat: bool = False,
    tokenize_bf16: bool = False,
    optimizer: str = "adamw",
    pretokenized: bool = False,
) -> Tuple[TrainState, Dict]:
    """One full training step: tokenize -> forward/backward (optionally
    scan-accumulated over ``grad_accum`` micro-batches) -> clip -> AdamW.

    ``tokenize_bf16``: run the frozen-VQVAE encoder in bf16 (GN stats f32)
    — the f32-HIGHEST tokenize is half the d16 step time; token flips occur
    only where top-2 codebook distances sit within bf16 conv noise
    (measured agreement: tests/test_trainer.py).

    ``pretokenized``: ``img`` is instead the stored gt token ids (B, L)
    int32 (train/pretokenize.py); the per-step VQVAE encode — identical
    work every epoch under a frozen tokenizer — is skipped entirely. The
    reference pays this tax every step forever (trainer.py:105-107)."""
    tx = make_optimizer(clip, optimizer)
    mask = decay_mask(state.params)
    # bf16 tokenize uses the channels-last encoder (same bf16 noise class,
    # 157 -> 117 ms at B=32 — BENCHMARKS.md round-4 tokenize row)
    tokenize = VQ.img_to_idxBl_nhwc if tokenize_bf16 else VQ.img_to_idxBl

    def forward_on(params, img_mb, label_mb, key):
        if pretokenized:
            gt_BL = img_mb  # (B, L) int32 token ids from the token dataset
            gt_idx = [gt_BL[:, bg:ed] for bg, ed in var_cfg.begin_ends]
        else:
            gt_idx = tokenize(vae_cfg, vae_params, img_mb)
            gt_idx = [jax.lax.stop_gradient(i) for i in gt_idx]
            gt_BL = jnp.concatenate(gt_idx, axis=1)
        x_in = jax.lax.stop_gradient(
            Q.idx_to_var_input(vae_cfg, vae_params["quant"], gt_idx)
        )
        return loss_and_metrics(
            var_cfg, params, label_mb, x_in, gt_BL, key, label_smooth,
            dtype=dtype, prog_si=prog_si, prog_wp=prog_wp, remat=remat,
        )

    grad_fn = jax.value_and_grad(
        lambda p, im, lb, k: forward_on(p, im, lb, k), has_aux=True
    )

    if grad_accum <= 1:
        (loss, metrics), grads = grad_fn(state.params, img, label_B, step_key)
    else:
        B = img.shape[0]
        mb = B // grad_accum
        img_s = img[: mb * grad_accum].reshape((grad_accum, mb) + img.shape[1:])
        lab_s = label_B[: mb * grad_accum].reshape(grad_accum, mb)

        def acc_body(carry, inp):
            g_sum, l_sum, m_sum = carry
            im, lb, i = inp
            k = jax.random.fold_in(step_key, i)
            (loss, metrics), grads = grad_fn(state.params, im, lb, k)
            g_sum = jax.tree.map(jnp.add, g_sum, grads)
            m_sum = jax.tree.map(jnp.add, m_sum, metrics)
            return (g_sum, l_sum + loss, m_sum), None

        zero_g = jax.tree.map(jnp.zeros_like, state.params)
        zero_m = {k: jnp.float32(0)
                  for k in ("Lm", "Lt", "Accm", "Acct", "z_voc_usage")}
        (grads, loss, metrics), _ = jax.lax.scan(
            acc_body, (zero_g, 0.0, zero_m),
            (img_s, lab_s, jnp.arange(grad_accum)),
        )
        grads = jax.tree.map(lambda g: g / grad_accum, grads)
        loss = loss / grad_accum
        metrics = jax.tree.map(lambda m: m / grad_accum, metrics)

    gnorm = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(
        lambda u, p, m: -(lr) * (u + wd * p * m),
        updates, state.params, mask,
    )
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics, loss=loss, grad_norm=gnorm, lr=lr, wd=wd)
    return TrainState(params, opt_state, state.step + 1), metrics


@functools.partial(
    jax.jit,
    static_argnames=("var_cfg", "vae_cfg", "dtype"),
)
def eval_step(
    var_cfg: VARConfig, vae_cfg: VQVAEConfig, params: Dict, vae_params: Dict,
    img: jnp.ndarray, label_B: jnp.ndarray, dtype=jnp.bfloat16,
) -> Dict:
    """Eval metrics for one batch (reference eval_ep body,
    trainer.py:61-76): mean/tail CE (no smoothing) and accuracies."""
    gt_idx = VQ.img_to_idxBl(vae_cfg, vae_params, img)
    gt_BL = jnp.concatenate(gt_idx, axis=1)
    x_in = Q.idx_to_var_input(vae_cfg, vae_params["quant"], gt_idx)
    logits = var_train_forward(var_cfg, params, label_B, x_in, dtype=dtype)
    ce = _ce_with_smoothing(logits, gt_BL, 0.0)
    last_l = var_cfg.patch_nums[-1] ** 2
    pred = jnp.argmax(logits, axis=-1)
    B = img.shape[0]
    return {
        "L_mean": jnp.mean(ce) * B,
        "L_tail": jnp.mean(ce[:, -last_l:]) * B,
        "acc_mean": jnp.mean((pred == gt_BL).astype(jnp.float32)) * 100 * B,
        "acc_tail": jnp.mean((pred[:, -last_l:] == gt_BL[:, -last_l:])
                             .astype(jnp.float32)) * 100 * B,
        "tot": jnp.asarray(B, jnp.float32),
    }
