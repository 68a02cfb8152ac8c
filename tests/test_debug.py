"""NaN/anomaly debug mode (reference: utils/arg_util.py:137 dbg_nan,
train.py:173-174 autograd anomaly mode, models/helpers.py:61-75 RNG logs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvar_tpu.utils import debug as dbg


def test_nan_report_localizes_bad_leaves():
    tree = {
        "a": {"w": jnp.ones((4, 4)), "b": jnp.array([1.0, np.nan, np.inf])},
        "ids": jnp.arange(3),  # int leaf: ignored
        "clean": jnp.zeros((2,)),
    }
    lines = dbg.nan_report(tree, "params")
    assert len(lines) == 1
    assert lines[0].startswith("params/a/b:")
    assert "nan=1" in lines[0] and "inf=1" in lines[0]
    assert dbg.first_bad_leaf(tree, "params") == "params/a/b"
    assert dbg.nan_report({"x": jnp.ones(3)}) == []


def test_assert_finite_raises_with_report():
    with pytest.raises(FloatingPointError, match="grads/g"):
        dbg.assert_finite({"g": jnp.array([np.nan])}, "grads")
    dbg.assert_finite({"g": jnp.array([0.0])}, "grads")  # no raise


def test_checked_flags_nan_inside_jit():
    def f(x):
        return jnp.log(x)  # log(-1) -> nan inside the compiled program

    err, out = jax.jit(dbg.checked(f))(jnp.array([-1.0]))
    with pytest.raises(Exception, match="nan"):
        err.throw()
    err2, out2 = jax.jit(dbg.checked(f))(jnp.array([1.0]))
    err2.throw()  # clean input: no raise
    np.testing.assert_allclose(out2, 0.0)


def test_checked_grad_probe_catches_backward_nan():
    # sqrt(x) at x=0: forward finite (0), backward 1/(2 sqrt 0) = inf —
    # exactly the class torch's detect_anomaly catches (train.py:173-174).
    def loss_fn(p, x):
        return jnp.sum(jnp.sqrt(p["w"] * x)), {}

    good = {"w": jnp.array([4.0])}
    grads, loss = dbg.checked_grad_probe(loss_fn, good, jnp.array([1.0]))
    assert np.isfinite(float(loss)) and np.isfinite(float(grads["w"][0]))

    bad = {"w": jnp.array([0.0])}
    with pytest.raises(Exception, match="nan|inf|div"):
        dbg.checked_grad_probe(loss_fn, bad, jnp.array([1.0]))


def test_rng_fingerprint_stable_and_distinct():
    k = jax.random.PRNGKey(7)
    assert dbg.rng_fingerprint(k) == dbg.rng_fingerprint(jax.random.PRNGKey(7))
    assert dbg.rng_fingerprint(k) != dbg.rng_fingerprint(jax.random.PRNGKey(8))
    assert len(dbg.rng_fingerprint(k)) == 16


def test_train_loop_dbg_nan_raises_on_poisoned_params(tmp_path):
    """End-to-end: run_training with dbg_nan=True must stop with a
    FloatingPointError naming the bad leaves when the loss goes non-finite."""
    from sdvar_tpu.config import TrainConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.train import train_loop as tl

    pns = (1, 2)
    tc = TrainConfig(depth=2, reso=32, global_batch_size=2, epochs=1,
                     label_smooth=0.0, dbg_nan=True)
    vae_cfg = VQVAEConfig(vocab_size=32, z_channels=8, ch=32, patch_nums=pns)
    var_cfg = VARConfig(depth=2, patch_nums=pns, vocab_size=32, Cvae=8,
                        head_dim=32, num_classes=10)

    # poison the word-embed weight so the first forward yields NaN loss
    orig_build = tl.build_everything

    def poisoned_build(*a, **kw):
        vae_cfg_, var_cfg_, vae_params, state = orig_build(*a, **kw)
        w = state.params["word_embed"]["w"]
        state.params["word_embed"]["w"] = w.at[0, 0].set(jnp.nan)
        return vae_cfg_, var_cfg_, vae_params, state

    tl.build_everything = poisoned_build
    try:
        with pytest.raises(FloatingPointError, match="non-finite loss"):
            tl.run_training(tc, data_root=None, out_dir=str(tmp_path),
                            max_iters=1, dtype=jnp.float32,
                            var_cfg=var_cfg, vae_cfg=vae_cfg)
    finally:
        tl.build_everything = orig_build
