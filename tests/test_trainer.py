"""Trainer-layer tests: loss parity checks, decay mask, schedules,
progressive training, grad accumulation."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import TrainConfig, VARConfig, VQVAEConfig
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params
from sdvar_tpu.train.schedule import lr_wd_annealing
from sdvar_tpu.train.trainer import (
    decay_mask,
    eval_step,
    init_train_state,
    train_step,
)

PNS = (1, 2, 3)


@pytest.fixture(scope="module")
def stack():
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32)
    key = jax.random.PRNGKey(0)
    vae_params = init_vqvae_params(vae_cfg, key)
    base_params = init_var_params(var_cfg, jax.random.fold_in(key, 1))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (4, 3, 48, 48)).astype(np.float32))
    label = jnp.asarray([0, 1, 2, 3])

    def fresh_state():
        # train_step donates its state: every test gets its own copy
        return init_train_state(jax.tree.map(jnp.copy, base_params))

    return vae_cfg, var_cfg, vae_params, fresh_state, img, label


def test_decay_mask_rules(stack):
    _, _, _, fresh_state, _, _ = stack
    mask = decay_mask(fresh_state().params)
    assert mask["blocks"]["qkv_w"] is True
    assert mask["blocks"]["q_bias"] is False
    assert mask["blocks"]["fc1_b"] is False
    assert mask["blocks"]["scale_mul"] is False       # nowd key
    assert mask["pos_1LC"] is False                   # nowd key
    assert mask["pos_start"] is False
    assert mask["lvl_embed"] is False
    assert mask["class_emb"] is True                  # 2-D, decayed (ref rule)
    assert mask["head"]["w"] is True
    assert mask["head"]["b"] is False


def test_lr_wd_schedule_shapes():
    # warmup ramp then decay to ~wpe * peak
    peak = 1e-3
    lr0, _ = lr_wd_annealing("lin0", peak, 0.05, 0.0, 0, 100, 1000, wpe=0.01)
    lr_mid, _ = lr_wd_annealing("lin0", peak, 0.05, 0.0, 100, 100, 1000, wpe=0.01)
    lr_end, wd_end = lr_wd_annealing("lin0", peak, 0.05, 0.0, 999, 100, 1000,
                                     wpe=0.01)
    assert lr0 < lr_mid
    assert math.isclose(lr_mid, peak, rel_tol=1e-6)
    assert lr_end < 0.05 * peak
    assert wd_end < 1e-6
    for sche in ("cos", "lin", "lin00", "lin0.5", "exp"):
        lr, wd = lr_wd_annealing(sche, peak, 0.05, 0.0, 500, 100, 1000)
        assert 0 < lr <= peak and 0 <= wd <= 0.05


def test_train_step_reduces_loss(stack):
    vae_cfg, var_cfg, vae_params, fresh_state, img, label = stack
    losses = []
    s = fresh_state()
    for i in range(4):
        s, m = train_step(
            var_cfg, vae_cfg, s, vae_params, img, label,
            jnp.asarray(5e-3), jnp.asarray(0.0), jax.random.PRNGKey(0),
            label_smooth=0.0, dtype=jnp.float32,
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_accum_matches_full_batch(stack):
    vae_cfg, var_cfg, vae_params, fresh_state, img, label = stack
    base = fresh_state().params
    kw = dict(clip=0.0, label_smooth=0.0, dtype=jnp.float32)
    s1, m1 = train_step(
        var_cfg, vae_cfg, fresh_state(), vae_params, img,
        label, jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1),
        grad_accum=1, **kw,
    )
    s2, m2 = train_step(
        var_cfg, vae_cfg, fresh_state(), vae_params, img,
        label, jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(1),
        grad_accum=2, **kw,
    )
    # micro-batches use per-slice fold_in keys, so cond-drop draws differ;
    # losses are close and parameters move comparably.
    d1 = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                      s1.params, base)
    d2 = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                      s2.params, base)
    n1 = max(jax.tree.leaves(d1))
    n2 = max(jax.tree.leaves(d2))
    assert n1 > 0 and n2 > 0
    assert abs(n1 - n2) / n1 < 0.5


def test_progressive_training_stages(stack):
    vae_cfg, var_cfg, vae_params, fresh_state, img, label = stack
    s, m = train_step(
        var_cfg, vae_cfg, fresh_state(), vae_params, img,
        label, jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(2),
        label_smooth=0.0, dtype=jnp.float32, prog_si=1,
        prog_wp=jnp.asarray(0.5, jnp.float32),
    )
    assert np.isfinite(float(m["loss"]))
    assert float(m["Lt"]) == -1.0  # tail metrics undefined under truncation
    # params beyond... all params still get grads through truncated seq
    assert float(m["Accm"]) >= 0.0


def test_prog_schedule():
    tc = TrainConfig(depth=2, pg=0.5, pg0=1, epochs=10)
    S = 10
    assert tc.prog_si_at(0, 100, 1000, S) == 1
    assert tc.prog_si_at(50, 100, 1000, S) == 1
    assert tc.prog_si_at(500, 100, 1000, S) == S - 1
    mid = tc.prog_si_at(300, 100, 1000, S)
    assert 1 <= mid <= S - 1
    tc0 = TrainConfig(depth=2, pg=0.0)
    assert tc0.prog_si_at(123, 100, 1000, S) == -1


def test_eval_step_keys(stack):
    vae_cfg, var_cfg, vae_params, fresh_state, img, label = stack
    out = eval_step(var_cfg, vae_cfg, fresh_state().params, vae_params, img,
                    label, dtype=jnp.float32)
    assert set(out) == {"L_mean", "L_tail", "acc_mean", "acc_tail", "tot"}
    assert float(out["tot"]) == 4.0


def test_remat_matches_plain_gradients():
    """jax.checkpoint over the layer scan must not change loss or gradients
    (it only changes what is saved vs recomputed in the backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdvar_tpu.config import VARConfig
    from sdvar_tpu.models.var import init_var_params, var_train_forward

    cfg = VARConfig(depth=3, num_classes=10, patch_nums=(1, 2, 3),
                    vocab_size=32, Cvae=8, head_dim=16, cond_drop_rate=0.0,
                    drop_path_rate=0.0)
    params = init_var_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.L - 1, cfg.Cvae))
    lbl = jnp.array([1, 2])

    def loss(p, remat):
        lg = var_train_forward(cfg, p, lbl, x, remat=remat)
        return jnp.mean(lg ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_vae_train_step_consumes_ema_usage():
    """Minimal VQVAE training step: vq_train_forward's hit counts flow into
    update_vocab_hit_ema and vocab_usage_per_scale (the reference's codebook
    EMA machinery, models/quant.py:77-102), and SGD actually moves the
    codebook + conv weights."""
    from sdvar_tpu.train.vae_trainer import (
        init_vae_train_state,
        vae_train_step,
    )

    vae_cfg = VQVAEConfig(vocab_size=32, z_channels=8, ch=32, patch_nums=PNS)
    params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(0))
    state = init_vae_train_state(vae_cfg, params)
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 48, 48),
                           minval=-1, maxval=1))
    cb0 = np.asarray(state.params["quant"]["codebook"]).copy()

    losses = []
    for i in range(3):
        state, metrics = vae_train_step(
            vae_cfg, state, jnp.asarray(img), jnp.asarray(1e-3))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        usage = np.asarray(metrics["usage_per_scale"])
        assert usage.shape == (len(PNS),)
        assert (usage >= 0).all() and (usage <= 100).all()
    assert int(state.step) == 3
    # EMA tracker populated: step 0 copies the raw hit counts
    ema = np.asarray(state.ema_hits_SV)
    assert ema.sum() > 0
    # per-scale hit totals track tokens per scale (EMA of counts)
    assert (ema.sum(axis=1) > 0).all()
    # training moved the codebook (straight-through gradients reach it via
    # the codebook loss term)
    assert np.abs(np.asarray(state.params["quant"]["codebook"]) - cb0).max() > 0


def test_bf16_tokenize_agreement():
    """The bf16 tokenizer encoder (models/vqvae.img_to_f_bf16) must agree
    with the f32-HIGHEST golden path on the vast majority of token ids —
    flips can only occur where the top-2 codebook distances sit within
    bf16 conv noise — and train_step(tokenize_bf16=True) must run."""
    from sdvar_tpu.models import vqvae as VQ

    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (4, 3, 48, 48)), jnp.float32)
    ids32 = np.concatenate(
        [np.asarray(i) for i in VQ.img_to_idxBl(vae_cfg, vae_params, img)],
        axis=1)
    ids16 = np.concatenate(
        [np.asarray(i) for i in VQ.img_to_idxBl_bf16(vae_cfg, vae_params,
                                                     img)], axis=1)
    agree = (ids32 == ids16).mean()
    assert agree >= 0.85, agree  # random weights = worst case; real
    # checkpoints have far larger codebook margins

    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    state = init_train_state(init_var_params(var_cfg, jax.random.PRNGKey(1)))
    state, metrics = train_step(
        var_cfg, vae_cfg, state, vae_params, img,
        jnp.asarray([0, 1, 2, 3], jnp.int32),
        jnp.asarray(1e-4), jnp.asarray(0.05), jax.random.PRNGKey(2),
        label_smooth=0.0, dtype=jnp.float32, tokenize_bf16=True)
    assert np.isfinite(float(metrics["loss"]))


def test_adafactor_optimizer_trains():
    """optimizer="adafactor" (factored second moments — the single-chip
    d30 memory unlock, trainer.make_optimizer) runs and reduces loss."""
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(0))
    state = init_train_state(
        init_var_params(var_cfg, jax.random.PRNGKey(1)),
        optimizer="adafactor")
    # factored state must be far below adam's 2x params. The tiny test
    # model's dims sit under optax's min_dim_size_to_factor=128, so check
    # factoring directly at a production-like shape, and that the test
    # model at least avoids adam's 2x:
    import optax as _optax
    import jax as _jax

    big = {"w": jnp.zeros((1920, 5760))}
    fstate = _optax.scale_by_factored_rms().init(big)
    n_f = sum(a.size for a in _jax.tree.leaves(fstate) if hasattr(a, "size"))
    assert n_f < 0.02 * big["w"].size, n_f  # rows+cols, not elements
    n_params = sum(a.size for a in _jax.tree.leaves(state.params))
    n_opt = sum(a.size for a in _jax.tree.leaves(state.opt_state)
                if hasattr(a, "size"))
    assert n_opt < 1.2 * n_params, (n_opt, n_params)

    img = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (4, 3, 48, 48)), jnp.float32)
    label = jnp.asarray([0, 1, 2, 3], jnp.int32)
    losses = []
    for i in range(4):
        state, metrics = train_step(
            var_cfg, vae_cfg, state, vae_params, img, label,
            jnp.asarray(1e-3), jnp.asarray(0.0), jax.random.PRNGKey(i),
            label_smooth=0.0, dtype=jnp.float32, optimizer="adafactor")
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
