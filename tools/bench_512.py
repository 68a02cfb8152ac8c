"""VAR-d36 512px decode benchmark (model-zoo config: shared AdaLN, L=2240).

Usage: python tools/bench_512.py [batch] [modes...]   (default: 4 bf16 w8a8)
Modes: bf16 | w8a8 | w8a8-int8kv (INT8 KV cache + donated-cache reuse).
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

from sdvar_tpu.config import PATCH_NUMS_512, SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.ops.quantization import WEIGHT_KEYS, quantize_var_params

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
modes = sys.argv[2:] or ["bf16", "w8a8"]

var_cfg = VARConfig(depth=36, patch_nums=PATCH_NUMS_512, shared_aln=True)
vae_cfg = VQVAEConfig(patch_nums=PATCH_NUMS_512)
print(f"[512] VAR-d36 512px: C={var_cfg.embed_dim} L={var_cfg.L}", flush=True)
t0 = time.time()
params = init_var_params(var_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
jax.block_until_ready(params)
quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
print(f"[512] init {time.time()-t0:.0f}s", flush=True)

label = jnp.arange(batch, dtype=jnp.int32) % 1000
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

quantized = None
for mode in modes:
    if mode.startswith("w8a8"):
        if quantized is None:
            quantized = quantize_var_params(params, mode="w8a8")
            for k in WEIGHT_KEYS:
                if k in params["blocks"]:
                    params["blocks"][k].delete()
            params["head"]["w"].delete()
        p = quantized
    else:
        p = params
    kv_mode = "int8" if mode.endswith("int8kv") else "bf16"
    try:
        if kv_mode == "int8":
            from sdvar_tpu.ops.quantization import QuantizedKVCache

            cache = QuantizedKVCache.create(var_cfg, 2 * batch)
        else:
            from sdvar_tpu.models.var import KVCache

            cache = KVCache.create(var_cfg, 2 * batch)
        t0 = time.time()
        out, cache = decode_all_scales(
            var_cfg, vae_cfg, p, quant, label, jax.random.PRNGKey(2), samp,
            jnp.bfloat16, kv_mode=kv_mode, cache=cache, return_cache=True)
        out.block_until_ready()
        print(f"[512] {mode}: compile+run {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            out, cache = decode_all_scales(
                var_cfg, vae_cfg, p, quant, label, jax.random.PRNGKey(3 + i),
                samp, jnp.bfloat16, kv_mode=kv_mode, cache=cache,
                return_cache=True)
            out.block_until_ready()
            best = min(best, time.time() - t0)
        print(f"[512] d36-512 {mode} B={batch}: {best*1e3:.1f} ms/batch, "
              f"{batch/best:.2f} img/s", flush=True)
    except Exception as e:
        print(f"[512] {mode}: FAILED {type(e).__name__}: {e}", flush=True)
