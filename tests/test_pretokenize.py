"""Pre-tokenized training pipeline tests (tools/pretokenize.py +
train/pretokenize.py + trainer pretokenized path).

Covers: shard round-trip vs direct img_to_idxBl, resumability (completed
shards are not rewritten), pass rotation, bit-exact equivalence of the
pretokenized train_step vs the image-path train_step, and the run_training
token_root wiring end-to-end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import TrainConfig, VARConfig, VQVAEConfig
from sdvar_tpu.models import vqvae as VQ
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params
from sdvar_tpu.train.data import SyntheticImageNet, batch_arrays
from sdvar_tpu.train.pretokenize import (
    TokenDataset,
    build_token_datasets_for_passes,
    pretokenize_dataset,
)
from sdvar_tpu.train.trainer import init_train_state, train_step

PNS = (1, 2, 3)
RESO = 48
L = sum(p * p for p in PNS)


@pytest.fixture(scope="module")
def stack():
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=32,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    key = jax.random.PRNGKey(0)
    vae_params = init_vqvae_params(vae_cfg, key)
    base_params = init_var_params(var_cfg, jax.random.fold_in(key, 1))
    return vae_cfg, var_cfg, vae_params, base_params


@pytest.fixture(scope="module")
def token_dir(stack, tmp_path_factory):
    vae_cfg, _, vae_params, _ = stack
    out = str(tmp_path_factory.mktemp("tokens"))
    datasets = build_token_datasets_for_passes(
        None, RESO, passes=2, seed=0, synthetic_len=14)
    pretokenize_dataset(vae_cfg, vae_params, datasets, out,
                        batch=4, shard_size=6, log_every=0)
    return out


def test_shard_roundtrip_matches_direct_tokenize(stack, token_dir):
    vae_cfg, _, vae_params, _ = stack
    ds = TokenDataset(token_dir)
    assert len(ds) == 14 and ds.passes == 2 and ds.L == L
    img_sets = build_token_datasets_for_passes(None, RESO, passes=2, seed=0,
                                               synthetic_len=14)
    for p in range(2):
        ds.set_epoch(p)
        for i in (0, 5, 6, 13):  # cross shard boundaries (shard_size=6)
            toks, lab = ds[i]
            img, _ = img_sets[p][i]
            ids = np.asarray(jnp.concatenate(
                VQ.img_to_idxBl(vae_cfg, vae_params,
                                jnp.asarray(img)[None]), axis=1))[0]
            np.testing.assert_array_equal(toks, ids, err_msg=f"pass {p} i {i}")
            # labels are stored once, from pass 0 (augmentation passes vary
            # only the crop/flip, never the class)
            assert lab == img_sets[0][i][1]


def test_pass_rotation(token_dir):
    ds = TokenDataset(token_dir)
    ds.set_epoch(0)
    t0, _ = ds[3]
    ds.set_epoch(1)
    t1, _ = ds[3]
    ds.set_epoch(2)  # wraps to pass 0
    t2, _ = ds[3]
    assert not np.array_equal(t0, t1)  # different crops -> different tokens
    np.testing.assert_array_equal(t0, t2)


def test_resume_skips_complete_shards(stack, token_dir):
    vae_cfg, _, vae_params, _ = stack
    first = os.path.join(token_dir, "tokens_00000.npy")
    last = os.path.join(token_dir, "tokens_00002.npy")
    os.remove(last)
    os.remove(os.path.join(token_dir, "labels_00002.npy"))
    mtime = os.path.getmtime(first)
    datasets = build_token_datasets_for_passes(None, RESO, passes=2, seed=0,
                                               synthetic_len=14)
    pretokenize_dataset(vae_cfg, vae_params, datasets, token_dir,
                        batch=4, shard_size=6, log_every=0)
    assert os.path.exists(last)                      # rebuilt
    assert os.path.getmtime(first) == mtime          # untouched


def test_train_step_token_path_matches_image_path(stack):
    vae_cfg, var_cfg, vae_params, base_params = stack
    ds = SyntheticImageNet(reso=RESO, length=8, seed=0)
    img, label = batch_arrays(ds, list(range(4)))
    gt_BL = np.asarray(jnp.concatenate(
        VQ.img_to_idxBl(vae_cfg, vae_params, jnp.asarray(img)), axis=1))

    common = dict(clip=2.0, label_smooth=0.1, dtype=jnp.float32)
    losses = {}
    for mode in ("image", "tokens"):
        state = init_train_state(jax.tree.map(jnp.copy, base_params))
        inp = (jnp.asarray(img) if mode == "image"
               else jnp.asarray(gt_BL, jnp.int32))
        for it in range(2):
            state, metrics = train_step(
                var_cfg, vae_cfg, state, vae_params, inp,
                jnp.asarray(label), jnp.asarray(1e-3), jnp.asarray(0.01),
                jax.random.PRNGKey(it), pretokenized=(mode == "tokens"),
                **common,
            )
            losses.setdefault(mode, []).append(float(metrics["loss"]))
    # same tokens, same keys -> identical losses and updates
    np.testing.assert_allclose(losses["image"], losses["tokens"], rtol=1e-6)


def test_run_training_token_root(stack, token_dir, tmp_path):
    vae_cfg, var_cfg, _, _ = stack
    from sdvar_tpu.train.train_loop import run_training

    tc = TrainConfig(depth=2, reso=RESO, global_batch_size=4, epochs=1,
                     label_smooth=0.0)
    state, history = run_training(
        tc, out_dir=str(tmp_path / "out"), seed=0, max_iters=3,
        batch_override=4, var_cfg=var_cfg, vae_cfg=vae_cfg,
        token_root=token_dir,
    )
    assert len(history) == 3
    assert all(np.isfinite(h["loss"]) for h in history)
