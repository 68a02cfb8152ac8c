"""Mesh/sharding tests on the virtual 8-device CPU mesh: tensor-parallel
decode and training must be numerically identical to single-device runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sdvar_tpu.config import MeshConfig, SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.parallel import distributed as D
from sdvar_tpu.parallel.mesh import create_mesh, var_param_specs

PNS = (1, 2, 3)


@pytest.fixture(scope="module")
def stack():
    # heads = depth = 4 divisible by model=4; vocab 64 divisible too
    var_cfg = VARConfig(depth=4, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, head_dim=64,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    key = jax.random.PRNGKey(0)
    params = init_var_params(var_cfg, key)
    quant = init_quantizer_params(vae_cfg, jax.random.fold_in(key, 1),
                                  eini=1.0)
    return var_cfg, vae_cfg, params, quant


def test_mesh_creation_shapes():
    mesh = create_mesh(MeshConfig(data=2, model=4))
    assert mesh.shape == {"data": 2, "model": 4}
    mesh1 = create_mesh(MeshConfig(data=1, model=1))
    assert mesh1.shape == {"data": 1, "model": 1}


def test_tp_sharded_decode_matches_unsharded(stack):
    var_cfg, vae_cfg, params, quant = stack
    label = jnp.array([1, 2, 3, 4])
    samp = SamplingConfig(cfg=1.5, top_k=1)
    key = jax.random.PRNGKey(5)

    base = decode_all_scales(var_cfg, vae_cfg, params, quant, label, key,
                             samp, jnp.float32)

    mesh = create_mesh(MeshConfig(data=2, model=4))
    specs = var_param_specs(var_cfg)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )
    quant_s = jax.device_put(quant, NamedSharding(mesh, P()))
    label_s = jax.device_put(label, NamedSharding(mesh, P("data")))
    out = decode_all_scales(var_cfg, vae_cfg, sharded, quant_s, label_s, key,
                            samp, jnp.float32)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out),
                               rtol=1e-4, atol=1e-4)


def test_param_specs_cover_tree(stack):
    var_cfg, _, params, _ = stack
    specs = var_param_specs(var_cfg)
    # every param leaf has a matching spec leaf
    pl = jax.tree.leaves(params)
    sl = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(pl) == len(sl)
    # sharded dims divide evenly on a 4-way model axis
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = jax.tree_util.tree_leaves_with_path(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    for (pp, a), (sp, s) in zip(flat_p, flat_s):
        assert pp == sp
        for dim, name in zip(a.shape, tuple(s) + (None,) * 8):
            if name == "model":
                assert dim % 4 == 0, (pp, a.shape, s)


def test_distributed_helpers_single_process():
    D.initialize()  # no-op
    assert D.get_rank() == 0
    assert D.get_world_size() == 1
    assert D.is_master()
    D.barrier()  # no-op
    x = np.array([1.0, 2.0])
    np.testing.assert_array_equal(D.allreduce_host(x), x)
    assert D.allgather_host(x).shape == (1, 2)
    parts = D.allgather_host_varlen(np.ones((3, 2), np.float32))
    assert len(parts) == 1 and parts[0].shape == (3, 2)

    calls = []

    @D.master_only
    def f():
        calls.append(1)
        return 7

    assert f() == 7 and calls == [1]


def test_shard_tree_quantized_params(stack):
    """W8A8/INT8-quantized params shard with the PLAIN weight specs: q
    takes the weight spec verbatim, the per-output-channel scale drops the
    contraction axis (column-sharded qkv/fc1 -> model-sharded scales;
    row-sharded proj/fc2 -> replicated scales). The TP + quantized serving
    path depends on this (tools/bench_serving.py mesh mode)."""
    from sdvar_tpu.ops.quantization import W8A8Linear, quantize_var_params
    from sdvar_tpu.parallel.mesh import MODEL, shard_tree

    var_cfg, vae_cfg, params, quant = stack
    qparams = quantize_var_params(params, mode="w8a8")
    mesh = create_mesh(MeshConfig(data=2, model=4))
    sharded = shard_tree(qparams, var_param_specs(var_cfg), mesh)

    qkv = sharded["blocks"]["qkv_w"]
    assert isinstance(qkv, W8A8Linear)
    assert qkv.q.sharding.spec == P(None, None, MODEL)
    assert qkv.scale.sharding.spec == P(None, MODEL)
    proj = sharded["blocks"]["proj_w"]
    assert proj.q.sharding.spec == P(None, MODEL, None)
    assert proj.scale.sharding.spec == P(None, None)
    head = sharded["head"]["w"]
    assert head.q.sharding.spec == P(None, MODEL)
    assert head.scale.sharding.spec == P(MODEL)

    # quantized + sharded decode runs and matches quantized unsharded
    label = jnp.arange(4, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    samp = SamplingConfig(cfg=1.5, top_k=16)
    f_sh, ids_sh = decode_all_scales(
        var_cfg, vae_cfg, sharded, quant, label, key, samp, jnp.float32,
        return_ids=True)
    f_un, ids_un = decode_all_scales(
        var_cfg, vae_cfg, qparams, quant, label, key, samp, jnp.float32,
        return_ids=True)
    np.testing.assert_array_equal(np.asarray(ids_sh), np.asarray(ids_un))
