"""jax.profiler trace of the pre-tokenized TRAIN step with an op-level
breakdown (round-4 VERDICT ask #6 companion to tools/adjudicate_mfu.py —
isolated microbenches on the axon tunnel measure 2x pessimistic vs
in-context rates, so the in-context attribution comes from the trace).

CAVEAT: fusion names name ONE op of the fusion (see tools/profile_decode.py
header); category sums below are indicative, ablation-confirm before
optimizing. Usage: python tools/profile_train.py [depth] [batch]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from sdvar_tpu.config import VARConfig, VQVAEConfig
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.train.trainer import init_train_state, train_step

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 16
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
params = init_var_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
state = init_train_state(params)
vae_params = {"quant": init_quantizer_params(vae_cfg, jax.random.PRNGKey(3))}
gt = jnp.zeros((batch, cfg.L), jnp.int32)
label = jnp.zeros((batch,), jnp.int32)


def step(state):
    return train_step(cfg, vae_cfg, state, vae_params, gt, label,
                      jnp.asarray(1e-4), jnp.asarray(0.05),
                      jax.random.PRNGKey(1), dtype=jnp.bfloat16,
                      remat=True, pretokenized=True)


print("[prof] compile + warmup...", flush=True)
s, m = step(state)
float(m["loss"])
t0 = time.time()
s, m = step(s)
float(m["loss"])
print(f"[prof] steady-state step: {(time.time()-t0)*1e3:.1f} ms", flush=True)

logdir = "/tmp/sdvar_prof_train"
with jax.profiler.trace(logdir):
    s, m = step(s)
    float(m["loss"])

cands = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
assert cands, "no trace captured"
with gzip.open(cands[-1], "rt") as f:
    trace = json.load(f)
events = trace.get("traceEvents", [])
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

bytime = defaultdict(float)
count = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "xla" not in pname.lower() \
            and "device" not in pname.lower():
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3
    bytime[name] += dur
    count[name] += 1
    total += dur

print(f"[prof] total device op time: {total:.1f} ms")
cats = defaultdict(float)
for name, ms in bytime.items():
    n = name.lower()
    if "fusion" in n and ("dot" in n or "convert_dot" in n) or n.startswith(
            "dot") or "matmul" in n or "gemm" in n or "einsum" in n:
        cats["dot/GEMM-named"] += ms
    elif "custom-call" in n or "mosaic" in n or "attention" in n:
        cats["custom-call (pallas attn)"] += ms
    elif "reduce" in n or "softmax" in n or "exp" in n:
        cats["reduce/softmax-named"] += ms
    elif "copy" in n or "transpose" in n or "bitcast" in n:
        cats["copy/transpose-named"] += ms
    else:
        cats["other-fusions"] += ms
for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"[prof] {k:28s} {v:8.1f} ms ({v/max(total,1e-9)*100:.0f}%)")
print(f"\n{'ms':>10}  {'n':>5}  op")
for name, ms in sorted(bytime.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:10.2f}  {count[name]:5d}  {name[:110]}")
