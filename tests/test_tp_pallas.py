"""TP x Pallas partitioning proof (VERDICT round-2 missing item #5).

Establishes the partitioning story for Mosaic kernels under a sharded mesh:

  1. GSPMD canNOT auto-partition a pallas_call — feeding a model-sharded
     operand into the kernel under plain jit is a hard compile error (shown
     against the AOT v5e:2x4 TPU topology, no hardware needed). This is why
     ops/partition exists.
  2. The shard_map-wrapped kernels (ops/partition) are numerically
     IDENTICAL to the unsharded kernels — proven bitwise in interpret mode
     on the 8-device CPU mesh, for bf16/bias/token-major/INT8-scale
     variants, and end-to-end for the full mesh decode.
  3. The REAL TP decode program — TP-sharded params, Mosaic attention
     kernels, fused sampler — compiles for a multi-chip v5e topology
     (AOT), with the kernels inside shard_map manual regions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdvar_tpu.ops import attention as A
from sdvar_tpu.ops import sampling as S
from sdvar_tpu.ops.partition import (
    set_pallas_interpret,
    set_tp_mesh,
    sharded_fused_sample,
    sharded_pallas_attention,
)
from sdvar_tpu.parallel.mesh import DATA, MODEL, create_mesh
from sdvar_tpu.config import MeshConfig


@pytest.fixture
def mesh24():
    mesh = create_mesh(MeshConfig(data=2, model=4))
    set_tp_mesh(mesh)
    set_pallas_interpret(True)
    yield mesh
    set_tp_mesh(None)
    set_pallas_interpret(False)


def _qkv(B=8, Lq=16, Lk=24, H=8, hd=64, tm=False, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Lq, H, hd), jnp.float32)
    kshape = (Lk, B, H, hd) if tm else (B, Lk, H, hd)
    k = jax.random.normal(ks[1], kshape, jnp.float32)
    v = jax.random.normal(ks[2], kshape, jnp.float32)
    return q, k, v


@pytest.mark.parametrize("tm", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
def test_sharded_attention_bitwise_vs_unsharded(mesh24, tm, with_bias):
    """shard_map over (data=2, model=4) must not change a single bit vs the
    same kernel run unsharded (each head is computed independently with the
    same op sequence regardless of the head-group blocking)."""
    from sdvar_tpu.ops.pallas.attention import pallas_attention

    q, k, v = _qkv(tm=tm)
    bias = None
    if with_bias:
        bias = jnp.where(
            jax.random.uniform(jax.random.PRNGKey(9), (16, 24)) < 0.3,
            -jnp.inf, 0.0).astype(jnp.float32)
    sharded = sharded_pallas_attention(q, k, v, bias, 0.125,
                                       kv_token_major=tm, interpret=True)
    assert sharded is not None
    plain = pallas_attention(q, k, v, bias, 0.125, interpret=True,
                             kv_token_major=tm)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_sharded_attention_int8_scales_bitwise(mesh24):
    """INT8 KV with per-token dequant scales through the sharded wrapper."""
    from sdvar_tpu.ops.pallas.attention import pallas_attention

    B, Lq, Lk, H, hd = 8, 16, 24, 8, 64
    q, _, _ = _qkv(B, Lq, Lk, H, hd)
    rng = np.random.default_rng(3)
    k8 = jnp.asarray(rng.integers(-127, 128, (Lk, B, H, hd), np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, (Lk, B, H, hd), np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (Lk, B)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.02, (Lk, B)), jnp.float32)
    sharded = sharded_pallas_attention(
        q.astype(jnp.bfloat16), k8, v8, None, 0.125, kv_token_major=True,
        kv_scales=(ks, vs), interpret=True)
    assert sharded is not None
    plain = pallas_attention(q.astype(jnp.bfloat16), k8, v8, None, 0.125,
                             interpret=True, kv_token_major=True,
                             kv_scales=(ks, vs))
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_sharded_attention_falls_back_on_indivisible(mesh24):
    """H=6 does not divide model=4 -> the wrapper must decline (caller then
    uses the XLA composition, which GSPMD partitions)."""
    q, k, v = _qkv(H=6, hd=64)
    assert sharded_pallas_attention(q, k, v, None, 0.125,
                                    interpret=True) is None


def test_sharded_fused_sampler_bitwise(mesh24):
    """Per-row-seed fused sampling is topology-invariant by construction
    (noise = f(request key, position)): sharded == unsharded, bitwise."""
    from sdvar_tpu.ops.pallas.sampling import fused_sample

    B, l, V = 16, 4, 256
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, l, V), jnp.float32)
    row_seeds = jnp.asarray(
        np.random.default_rng(0).integers(-2**31, 2**31, B * l, np.int64),
        jnp.int32)
    sharded = sharded_fused_sample(logits, row_seeds, 50, 0.9, interpret=True)
    assert sharded is not None
    plain = fused_sample(logits, jnp.int32(0), 50, 0.9,
                         row_seeds=row_seeds, interpret=True)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_mesh_decode_pallas_matches_single_device(mesh24):
    """Full KV-cached CFG decode: forced-Pallas under the (2, 4) mesh must
    produce bit-identical token ids to forced-Pallas on one device (the
    sampler is pinned to XLA on both sides — its partitioning is exercised
    above; jax.random partitions deterministically)."""
    from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.parallel.mesh import shard_tree, var_param_specs

    pns = (1, 2, 3)
    # depth=8 -> num_heads=8 (heads = depth): 2 heads/shard on model=4,
    # satisfying the 128-lane merged-head rule (2*64=128)
    var_cfg = VARConfig(depth=8, num_classes=10, patch_nums=pns,
                        vocab_size=64, Cvae=8, head_dim=64,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=pns)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0))
    quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1), eini=1.0)
    label = jnp.arange(8, dtype=jnp.int32) % 10
    key = jax.random.PRNGKey(7)
    samp = SamplingConfig(cfg=1.5, top_k=16, top_p=0.9)

    S.set_sampler_impl("xla")
    A.set_attention_impl("pallas")
    try:
        mesh = mesh24
        sharded_params = shard_tree(params, var_param_specs(var_cfg), mesh)
        label_sh = jax.device_put(label, NamedSharding(mesh, P(DATA)))
        f_mesh, ids_mesh = decode_all_scales(
            var_cfg, vae_cfg, sharded_params, quant, label_sh, key, samp,
            jnp.float32, return_ids=True)
        ids_mesh = np.asarray(jax.device_get(ids_mesh))

        set_tp_mesh(None)  # single-device reference, same kernel
        f_one, ids_one = decode_all_scales(
            var_cfg, vae_cfg, params, quant, label, key, samp,
            jnp.float32, return_ids=True)
        np.testing.assert_array_equal(ids_mesh, np.asarray(ids_one))
        np.testing.assert_allclose(np.asarray(f_mesh), np.asarray(f_one),
                                   rtol=1e-6, atol=1e-6)
    finally:
        A.set_attention_impl("auto")
        S.set_sampler_impl("auto")


# ---------------------------------------------------------------------------
# AOT v5e:2x4 topology: the real multi-chip story, no hardware needed
# ---------------------------------------------------------------------------

def _v5e_2x4_mesh():
    from tests.aot_common import get_tpu_topology

    try:
        topo = get_tpu_topology("v5e:2x4")
    except Exception as e:  # no TPU compiler support in this install
        pytest.skip(f"AOT TPU topology unavailable: {e}")
    devs = np.asarray(topo.devices).reshape(2, 4)
    return Mesh(devs, (DATA, MODEL))


def test_gspmd_cannot_partition_mosaic():
    """The failure mode ops/partition exists for: plain jit + model-sharded
    operand into a pallas_call is a COMPILE error on a real multi-chip
    topology."""
    from jax.experimental import pallas as pl

    mesh = _v5e_2x4_mesh()

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
        )(x)

    x = jax.ShapeDtypeStruct((8, 512), jnp.float32)
    sh = NamedSharding(mesh, P(None, MODEL))
    with pytest.raises(Exception, match="[Mm]osaic|shard_map|partition"):
        jax.jit(f, in_shardings=(sh,)).lower(x).compile()


@pytest.mark.parametrize("quantized", [False, True])
def test_tp_decode_compiles_for_v5e_2x4(quantized):
    """The REAL TP serving program — TP-sharded VAR params, shard_map'd
    Mosaic attention, fused per-request-seed sampler — AOT-compiles for a
    multi-chip v5e topology. Round-2 could not make this claim: the
    un-wrapped kernels fail exactly as shown above. ``quantized`` is the
    north-star serving config: W8A8 int8 weights (quantization-aware
    shard_tree specs) + INT8 KV cache with the per-token scale planes
    riding the sharded Pallas attention."""
    from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.ops.quantization import quantize_var_params
    from sdvar_tpu.parallel.mesh import shard_tree, var_param_specs

    mesh = _v5e_2x4_mesh()
    pns = (1, 2, 3)
    var_cfg = VARConfig(depth=8, num_classes=10, patch_nums=pns,
                        vocab_size=256, Cvae=8, head_dim=64,
                        cond_drop_rate=0.0, drop_path_rate=0.0)
    vae_cfg = VQVAEConfig(vocab_size=256, z_channels=8, ch=32,
                          patch_nums=pns)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0))
    quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1), eini=1.0)
    specs = var_param_specs(var_cfg)
    if quantized:
        params = quantize_var_params(params, mode="w8a8")
        # reuse shard_tree's quantization-aware spec expansion by placing
        # on a CPU mesh first, then lifting the shardings' specs
        cpu_mesh = create_mesh(MeshConfig(data=2, model=4))
        placed = shard_tree(params, specs, cpu_mesh)
        params_abs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype,
                sharding=NamedSharding(mesh, a.sharding.spec)),
            placed)
    else:
        params_abs = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(mesh, s)),
            params, specs, is_leaf=lambda x: isinstance(x, P))
    quant_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=NamedSharding(mesh, P())),
        quant)
    B = 16
    keys = jax.vmap(jax.random.key)(jnp.arange(B, dtype=jnp.uint32))
    keys_abs = jax.ShapeDtypeStruct(
        keys.shape, keys.dtype, sharding=NamedSharding(mesh, P()))
    label_abs = jax.ShapeDtypeStruct(
        (B,), jnp.int32, sharding=NamedSharding(mesh, P(DATA)))

    set_tp_mesh(mesh)
    A.set_attention_impl("pallas")
    S.set_sampler_impl("pallas")
    try:
        lowered = decode_all_scales.lower(
            var_cfg, vae_cfg, params_abs, quant_abs, label_abs, keys_abs,
            SamplingConfig(cfg=1.5, top_k=50, top_p=0.9), jnp.bfloat16,
            kv_mode="int8" if quantized else "bf16",
        )
        compiled = lowered.compile()
        hlo = compiled.as_text()
    finally:
        set_tp_mesh(None)
        A.set_attention_impl("auto")
        S.set_sampler_impl("auto")

    # Mosaic kernels present (attention per scale + fused sampler) and the
    # program partitioned without gathering the TP-sharded weights
    assert "tpu_custom_call" in hlo
    import re

    # no all-gather reassembling the TP-sharded qkv/fc weights (shapes
    # (depth, C, 3C)=(8, 512, 1536) and (depth, C, 4C)=(8, 512, 2048))
    gathered_weights = [
        l for l in hlo.splitlines()
        if "all-gather" in l
        and re.search(r"\[8,512,(1536|2048)\]|\[8,2048,512\]", l)
    ]
    assert not gathered_weights, gathered_weights[:3]


def test_one_device_mesh_keeps_unsharded_fast_paths(monkeypatch):
    """A registered 1-device mesh is a no-op: the UNSHARDED Pallas kernels
    must still be used (regression: treating it as active silently rerouted
    the int8 decode onto the XLA dequant path — 3.7 vs 14+ img/s serving)."""
    import sdvar_tpu.ops.pallas.attention as PA
    from sdvar_tpu.config import MeshConfig
    from sdvar_tpu.parallel.mesh import create_mesh

    calls = []
    real = PA.pallas_attention
    monkeypatch.setattr(PA, "pallas_attention",
                        lambda *a, **kw: calls.append(1) or real(*a, **kw))

    mesh = create_mesh(MeshConfig(data=1, model=1))
    set_tp_mesh(mesh)
    set_pallas_interpret(True)
    A.set_attention_impl("pallas")
    try:
        q, k, v = _qkv(B=2, Lq=16, Lk=24, H=2, hd=64)
        out = A.attention(q, k, v, None, 0.125)
        assert calls, "unsharded pallas kernel was not used under 1-dev mesh"
        assert out.shape == q.shape
    finally:
        A.set_attention_impl("auto")
        set_tp_mesh(None)
        set_pallas_interpret(False)
