"""Entry-point mesh training: ``run_training`` on the virtual 8-device mesh
(data=2 x model=4) must match single-device training numerically, and the
multi-rank sampler paths must partition the global batch correctly.

This drives the REAL entry point (not a bespoke script) — VERDICT round-1
item #1; reference equivalents: DDP wrap train.py:102, per-rank batch split
utils/arg_util.py:255-257, per-rank sampler slice utils/data_sampler.py:96-100.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import MeshConfig, TrainConfig, VARConfig, VQVAEConfig
from sdvar_tpu.train.data import DistInfiniteBatchSampler
from sdvar_tpu.train.train_loop import run_training

PNS = (1, 2, 3)


def _tiny_cfgs(model: int = 4):
    # heads = depth = 4 and vocab divisible by the 4-way model axis
    vae_cfg = VQVAEConfig(vocab_size=16 * model, z_channels=8, ch=32,
                          patch_nums=PNS)
    var_cfg = VARConfig(depth=4, patch_nums=PNS, vocab_size=16 * model,
                        Cvae=8, num_classes=1000, head_dim=64,
                        drop_path_rate=0.0)
    return var_cfg, vae_cfg


def _run(tmp_path, mesh_cfg, iters=10):
    var_cfg, vae_cfg = _tiny_cfgs()
    tc = TrainConfig(depth=4, reso=48, global_batch_size=4, epochs=1,
                     label_smooth=0.1)
    return run_training(
        tc, data_root=None, out_dir=str(tmp_path), max_iters=iters,
        dtype=jnp.float32, mesh_cfg=mesh_cfg,
        var_cfg=var_cfg, vae_cfg=vae_cfg,
    )


def test_entrypoint_mesh_matches_single_device(tmp_path):
    state_1d, hist_1d = _run(tmp_path / "a", None)
    state_mesh, hist_mesh = _run(tmp_path / "b", MeshConfig(data=2, model=4))

    assert len(hist_1d) == len(hist_mesh) >= 2
    for m1, m2 in zip(hist_1d, hist_mesh):
        assert m1["it"] == m2["it"]
        np.testing.assert_allclose(m1["loss"], m2["loss"],
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(state_1d.params),
                    jax.tree.leaves(state_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_mesh_batch_is_data_sharded(tmp_path):
    from sdvar_tpu.parallel.mesh import create_mesh, shard_batch
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(MeshConfig(data=2, model=4))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    g = shard_batch(mesh, x, P("data"))
    assert g.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(g), x)
    assert g.sharding.spec == P("data")


def test_sampler_multirank_partition():
    """With world_size=2, the per-rank slices are disjoint contiguous halves
    of one epoch-seeded global permutation and cover the dataset
    (reference: utils/data_sampler.py:67-103)."""
    N, GB, W = 100, 8, 2
    per_epoch = []
    for rank in range(W):
        s = DistInfiniteBatchSampler(N, GB, world_size=W, rank=rank, seed=3)
        assert s.batch_size == GB // W
        it = iter(s)
        batches = [next(it) for _ in range(s.iters_per_ep)]
        assert all(len(b) == GB // W for b in batches)
        per_epoch.append([i for b in batches for i in b])
    joined = per_epoch[0] + per_epoch[1]
    # fill-last pads by wrapping: total == iters_per_ep * GB >= N, coverage
    # of the dataset is complete and overlap is exactly the pad
    assert len(joined) == ((N + GB - 1) // GB) * GB
    assert set(joined) == set(range(N))
    # the two ranks see the two contiguous halves of the same global perm
    g = np.random.default_rng(3 + 0).permutation(N)
    total = ((N + GB - 1) // GB) * GB
    glob = np.concatenate([g, g[: total - N]])
    np.testing.assert_array_equal(np.asarray(joined), glob)


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path):
    """Orbax checkpointing must round-trip a TP-sharded TrainState and land
    the restore back on the mesh with the template's shardings (pod-scale
    analogue of the reference's auto_resume, utils/misc.py:344-357)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.parallel.mesh import create_mesh, shard_tree, var_param_specs
    from sdvar_tpu.train import checkpoint as ckpt
    from sdvar_tpu.train.trainer import TrainState, init_train_state

    var_cfg, _ = _tiny_cfgs()
    mesh = create_mesh(MeshConfig(data=2, model=4))
    params = shard_tree(init_var_params(var_cfg, jax.random.PRNGKey(3)),
                        var_param_specs(var_cfg), mesh)
    state = init_train_state(params)

    path = ckpt.save_checkpoint(str(tmp_path), 7, state, meta={"epoch": 1})

    # restore into a zeroed template that carries the target shardings
    template = jax.tree.map(jnp.zeros_like, state)
    loaded, meta = ckpt.load_checkpoint(path, template)
    assert meta["step"] == 7 and meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding, (a.sharding, b.sharding)

    # auto_resume picks the newest and shape-mismatch templates are rejected
    loaded2, meta2 = ckpt.auto_resume(str(tmp_path), template)
    assert loaded2 is not None and meta2["step"] == 7
    bad_cfg, _ = _tiny_cfgs()
    bad = init_train_state(init_var_params(
        VARConfig(depth=2, patch_nums=PNS, vocab_size=64, Cvae=8,
                  num_classes=1000, head_dim=64), jax.random.PRNGKey(0)))
    none_loaded, m0 = ckpt.auto_resume(str(tmp_path), bad)
    assert none_loaded is None and m0["step"] == 0


def test_sampler_resume_mid_epoch():
    """start_ep/start_it resume lands exactly where the fresh run was
    (reference resumability: utils/data_sampler.py:81-86)."""
    s = DistInfiniteBatchSampler(64, 8, world_size=2, rank=1, seed=7)
    it = iter(s)
    seen = [next(it) for _ in range(11)]  # 8 iters/ep + 3 into epoch 2
    s2 = DistInfiniteBatchSampler(64, 8, world_size=2, rank=1, seed=7,
                                  start_ep=11 // 8, start_it=11 % 8)
    it2 = iter(s2)
    assert next(it2) == next(it)
    assert next(it2) == next(it)


def test_entrypoint_mesh_token_path_matches_single_device(tmp_path):
    """The pre-tokenized pipeline through the REAL entry point on the
    2x4 mesh == single-device, same tokens (round-4 token_root wiring +
    shard_batch of int32 token batches)."""
    from sdvar_tpu.models.vqvae import init_vqvae_params
    from sdvar_tpu.train.pretokenize import (
        build_token_datasets_for_passes,
        pretokenize_dataset,
    )

    var_cfg, vae_cfg = _tiny_cfgs()
    vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(0))
    tok_dir = str(tmp_path / "tokens")
    datasets = build_token_datasets_for_passes(None, 48, passes=1, seed=0,
                                               synthetic_len=16)
    pretokenize_dataset(vae_cfg, vae_params, datasets, tok_dir,
                        batch=4, shard_size=8, log_every=0)

    tc = TrainConfig(depth=4, reso=48, global_batch_size=4, epochs=1,
                     label_smooth=0.1)

    def run(out, mesh_cfg):
        return run_training(
            tc, out_dir=str(tmp_path / out), max_iters=4,
            dtype=jnp.float32, mesh_cfg=mesh_cfg,
            var_cfg=var_cfg, vae_cfg=vae_cfg, token_root=tok_dir,
        )

    state_1d, hist_1d = run("one", None)
    state_mesh, hist_mesh = run("mesh", MeshConfig(data=2, model=4))
    assert len(hist_1d) == len(hist_mesh) == 4
    for m1, m2 in zip(hist_1d, hist_mesh):
        np.testing.assert_allclose(m1["loss"], m2["loss"],
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(state_1d.params),
                    jax.tree.leaves(state_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
