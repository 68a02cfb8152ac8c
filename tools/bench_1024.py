"""VAR 1024px-preset decode benchmark (14-scale schedule, L=9451).

The reference defines the 1024px patch_nums preset (utils/arg_util.py:244-249)
but ships no 1024px checkpoint; this benchmark proves the full-L decode path
— mask family, Pallas query-blocked attention at Lq up to 4096 / Lk 9451,
static KV cache — end-to-end on real TPU at the d16 width (VERDICT round-1
item #8: "full-L decode at reduced width").

Usage: python tools/bench_1024.py [depth] [batch] [modes...]
       (default: 16 2 bf16 w8a8-int8kv)
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

from sdvar_tpu.config import PATCH_NUMS_1024, SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.ops.quantization import WEIGHT_KEYS, quantize_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 16
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
modes = sys.argv[3:] or ["bf16", "w8a8-int8kv"]

var_cfg = VARConfig(depth=depth, patch_nums=PATCH_NUMS_1024)
vae_cfg = VQVAEConfig(patch_nums=PATCH_NUMS_1024)
print(f"[1024] VAR-d{depth} 1024px: C={var_cfg.embed_dim} L={var_cfg.L}",
      flush=True)
t0 = time.time()
params = init_var_params(var_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
jax.block_until_ready(params)
quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
print(f"[1024] init {time.time()-t0:.0f}s", flush=True)

label = jnp.arange(batch, dtype=jnp.int32) % 1000
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

quantized = None
for mode in modes:
    if mode.startswith("w8a8"):
        if quantized is None:
            quantized = quantize_var_params(params, mode="w8a8")
            if not any(m.startswith("bf16") for m in
                       modes[modes.index(mode):]):  # bf16 still needs them
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
        float(jnp.sum(out))  # host sync (see bench.py sync note)
        print(f"[1024] {mode} compile+first: {time.time()-t0:.1f}s",
              flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            out, cache = decode_all_scales(
                var_cfg, vae_cfg, p, quant, label, jax.random.PRNGKey(3 + i),
                samp, jnp.bfloat16, kv_mode=kv_mode, cache=cache,
                return_cache=True)
            float(jnp.sum(out))
            times.append(time.time() - t0)
        best = min(times)
        print(f"[1024] d{depth} B={batch} {mode}: {best*1000:.0f} ms/batch, "
              f"{batch/best:.3f} img/s "
              f"(times={['%.2f' % t for t in times]})", flush=True)
        del cache
    except Exception as e:
        print(f"[1024] {mode} FAILED: {type(e).__name__}: {e}", flush=True)
