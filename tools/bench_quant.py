"""Quantization-mode decode benchmark sweep on the local accelerator.

Usage: python tools/bench_quant.py [depth] [batch] [modes...]
modes from: bf16 w8 w8a8 w8a8_head, each optionally +kv8 (e.g. w8a8+kv8).
Default: bf16 w8a8 w8a8+kv8
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
from sdvar_tpu.ops.quantization import quantize_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
modes = sys.argv[3:] or ["bf16", "w8a8", "w8a8+kv8"]

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
key = jax.random.PRNGKey(0)
print(f"[q] init VAR-d{depth}...", flush=True)
t0 = time.time()
params = init_var_params(var_cfg, key, dtype=jnp.bfloat16)
jax.block_until_ready(params)
quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
print(f"[q] init done {time.time()-t0:.0f}s", flush=True)

label = jnp.arange(batch, dtype=jnp.int32) % 1000
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

# Prepare every mode's param tree up front, then free the bf16 originals —
# keeping both resident costs 4 GB of HBM and OOMs the larger batches.
prepared = {}
for mode in modes:
    base, _, kv = mode.partition("+")
    if base in prepared:
        continue
    if base == "bf16":
        prepared[base] = params
    elif base == "w8":
        prepared[base] = quantize_var_params(params)
    elif base == "w8a8":
        prepared[base] = quantize_var_params(params, mode="w8a8")
    elif base == "w8a8_head":
        prepared[base] = quantize_var_params(params, mode="w8a8",
                                             act_head=True)
    else:
        raise SystemExit(f"unknown mode {base}")
jax.block_until_ready(prepared)
if "bf16" not in prepared:
    # free ONLY the replaced fp weights (quantize_var_params shares every
    # other leaf with the original tree by reference)
    from sdvar_tpu.ops.quantization import WEIGHT_KEYS

    for k in WEIGHT_KEYS:
        if k in params["blocks"]:
            params["blocks"][k].delete()
    params["head"]["w"].delete()
del params

for mode in modes:
    base, _, kv = mode.partition("+")
    kv_mode = "int8" if kv == "kv8" else "bf16"
    p = prepared[base]
    try:
        t0 = time.time()
        out = decode_all_scales(var_cfg, vae_cfg, p, quant, label,
                                jax.random.PRNGKey(2), samp, jnp.bfloat16,
                                kv_mode=kv_mode)
        out.block_until_ready()
        print(f"[q] {mode}: compile+run {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for i in range(4):
            t0 = time.time()
            out = decode_all_scales(var_cfg, vae_cfg, p, quant, label,
                                    jax.random.PRNGKey(3 + i), samp,
                                    jnp.bfloat16, kv_mode=kv_mode)
            out.block_until_ready()
            best = min(best, time.time() - t0)
        print(f"[q] {mode}: {best*1e3:.1f} ms/batch, "
              f"{batch/best:.2f} img/s", flush=True)
    except Exception as e:
        print(f"[q] {mode}: FAILED {type(e).__name__}: {e}", flush=True)
