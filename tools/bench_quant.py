"""Bench decode with quantization variants on the local accelerator.

Usage: python tools/bench_quant.py [depth] "variant,variant,..."
Variants: bf16 | w8 | kv8 | w8kv8, each optionally "@B" (batch), e.g.
  python tools/bench_quant.py 30 "bf16@16,w8@16,w8kv8@32"
"""
from __future__ import annotations

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
from sdvar_tpu.ops.quantization import quantize_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
variants = (sys.argv[2] if len(sys.argv) > 2 else "bf16@16,w8@16,w8kv8@32"
            ).split(",")

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
key = jax.random.PRNGKey(0)
t0 = time.time()
params_bf16 = init_var_params(var_cfg, key, dtype=jnp.bfloat16)
qp = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
params_bf16, qp = jax.device_put((params_bf16, qp))
print(f"[bench] init {time.time()-t0:.1f}s", flush=True)
params_w8 = None

samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)
for spec in variants:
    name, _, b = spec.partition("@")
    batch = int(b) if b else 16
    label = jnp.arange(batch, dtype=jnp.int32) % 1000
    kv_mode = "int8" if name in ("kv8", "w8kv8") else "bf16"
    if name in ("w8", "w8kv8"):
        if params_w8 is None:
            t0 = time.time()
            params_w8 = jax.jit(quantize_var_params)(params_bf16)
            jax.block_until_ready(params_w8)
            print(f"[bench] quantize weights {time.time()-t0:.1f}s", flush=True)
        params = params_w8
    else:
        params = params_bf16
    try:
        t0 = time.time()
        decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp,
                          kv_mode=kv_mode).block_until_ready()
        print(f"[bench] {spec}: compile+warmup {time.time()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(4):
            t0 = time.time()
            decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp,
                              kv_mode=kv_mode).block_until_ready()
            times.append(time.time() - t0)
        best = min(times)
        print(f"[bench] d{depth} {spec}: {best*1e3:.1f} ms/batch, "
              f"{batch/best:.2f} img/s", flush=True)
    except Exception as e:
        print(f"[bench] {spec} FAILED: {type(e).__name__}: {e}", flush=True)
