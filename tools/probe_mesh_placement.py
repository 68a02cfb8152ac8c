"""Isolate the mesh-placement effect on decode throughput: the SAME
w8a8+int8kv d30 decode with (a) plainly-placed params vs (b) params/batch
committed to a 1-device Mesh via NamedSharding (what serving's mesh mode
does). If (b) is slower, the mesh path's cost is in placement/partitioning,
not the kernels."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from jax.sharding import NamedSharding, PartitionSpec as P
from sdvar_tpu.config import MeshConfig, SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.ops.quantization import WEIGHT_KEYS, QuantizedKVCache, quantize_var_params
from sdvar_tpu.parallel.mesh import create_mesh, shard_tree, var_param_specs
from sdvar_tpu.ops.partition import set_tp_mesh

B = 16
var_cfg = VARConfig(depth=30)
vae_cfg = VQVAEConfig()
params = init_var_params(var_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
jax.block_until_ready(params)
qp = quantize_var_params(params, mode="w8a8")
for k in WEIGHT_KEYS:
    if k in params["blocks"]:
        params["blocks"][k].delete()
params["head"]["w"].delete()
quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1), eini=1.0)
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)
seeds = np.arange(B, dtype=np.uint32)
keys = jax.vmap(jax.random.key)(jnp.asarray(seeds))
label = jnp.zeros((B,), jnp.int32)

def run(tag, p, lab, ks):
    cache = QuantizedKVCache.create(var_cfg, 2 * B)
    t0 = time.time()
    f, cache = decode_all_scales(var_cfg, vae_cfg, p, quant, lab, ks, samp,
                                 jnp.bfloat16, kv_mode="int8", cache=cache,
                                 return_cache=True)
    float(jnp.sum(f))
    print(f"[{tag}] compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for i in range(4):
        t0 = time.time()
        f, cache = decode_all_scales(var_cfg, vae_cfg, p, quant, lab, ks,
                                     samp, jnp.bfloat16, kv_mode="int8",
                                     cache=cache, return_cache=True)
        float(jnp.sum(f))
        ts.append(time.time() - t0)
    print(f"[{tag}] best {min(ts)*1e3:.0f} ms/batch = {B/min(ts):.1f} img/s "
          f"times={['%.3f' % t for t in ts]}", flush=True)

run("plain", qp, label, keys)

mesh = create_mesh(MeshConfig(data=1, model=1))
set_tp_mesh(mesh)
qp_m = shard_tree(qp, var_param_specs(var_cfg), mesh)
lab_m = jax.device_put(label, NamedSharding(mesh, P("data")))
keys_m = jax.device_put(keys, NamedSharding(mesh, P("data")))
run("mesh1x1", qp_m, lab_m, keys_m)
set_tp_mesh(None)
