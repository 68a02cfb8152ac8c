"""Time the fused d30 decode with a chosen attention backend.

Usage: python tools/bench_attention_impl.py {xla|pallas} [depth] [batch]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.ops.attention import set_attention_impl

impl = sys.argv[1]
depth = int(sys.argv[2]) if len(sys.argv) > 2 else 30
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
set_attention_impl(impl)

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
key = jax.random.PRNGKey(0)
t0 = time.time()
params = init_var_params(var_cfg, key, dtype=jnp.bfloat16)
qp = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
params, qp = jax.device_put((params, qp))
print(f"[bench] init {time.time()-t0:.1f}s", flush=True)

label = jnp.arange(batch, dtype=jnp.int32) % 1000
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

t0 = time.time()
decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp).block_until_ready()
print(f"[bench] compile+warmup {time.time()-t0:.1f}s", flush=True)

times = []
for _ in range(4):
    t0 = time.time()
    decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp).block_until_ready()
    times.append(time.time() - t0)
best = min(times)
print(f"[bench] impl={impl} d{depth} B={batch}: {best*1e3:.1f} ms/batch, "
      f"{batch/best:.2f} img/s", flush=True)
