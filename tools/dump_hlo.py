"""Dump the optimized HLO of the fused d30 decode (AOT compile; uses the
persistent cache, so it is fast after bench/profile runs).

Usage: python tools/dump_hlo.py [depth] [batch] [out.txt]
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
from sdvar_tpu.engine import decode as D
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/decode_d{depth}_b{batch}.hlo.txt"
w8a8 = "w8a8" in sys.argv[4:]
kv_mode = "int8" if "int8kv" in sys.argv[4:] else "bf16"

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()

# eval_shape-style AOT: build abstract params, no giant init
params = jax.eval_shape(lambda k: init_var_params(var_cfg, k, dtype=jnp.bfloat16),
                        jax.random.PRNGKey(0))
if w8a8:
    from sdvar_tpu.ops.quantization import quantize_var_params

    params = jax.eval_shape(
        lambda p: quantize_var_params(p, mode="w8a8"), params)
qp = jax.eval_shape(lambda k: init_quantizer_params(vae_cfg, k),
                    jax.random.PRNGKey(1))
label = jax.ShapeDtypeStruct((batch,), jnp.int32)
key = jax.ShapeDtypeStruct((2,), jnp.uint32)
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

t0 = time.time()
lowered = D.decode_all_scales.lower(
    var_cfg, vae_cfg, params, qp, label, jax.random.PRNGKey(0), samp,
    kv_mode=kv_mode,
)
print(f"[hlo] lowered in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"[hlo] compiled in {time.time()-t0:.1f}s", flush=True)
txt = compiled.as_text()
with open(out, "w") as f:
    f.write(txt)
print(f"[hlo] wrote {len(txt)/1e6:.1f} MB to {out}", flush=True)
try:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    for k in ("flops", "bytes accessed", "transcendentals"):
        if k in ca:
            print(f"[hlo] {k}: {ca[k]:.3e}")
except Exception as e:
    print("[hlo] cost_analysis unavailable:", e)
