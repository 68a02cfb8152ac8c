"""Capture a jax.profiler trace of the fused d30 decode and print an op-level
time breakdown (parses the Chrome-trace json the TPU profiler emits).

CAVEAT (learned round 4): trace event NAMES are fusion names, and a fusion
is named after ONE of its ops — a `convert_reduce_fusion` can be 96% conv.
Never attribute cost from the name alone; confirm with an ablation of the
suspected op inside the real program (and run each ablation variant in a
FRESH process: re-jitting after monkeypatching in-process can serve a stale
executable). See BENCHMARKS.md "decoder attribution" for the worked example.

Usage: python tools/profile_decode.py [depth] [batch]
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

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
w8a8 = "w8a8" in sys.argv[3:]
kv_mode = "int8" if "int8kv" in sys.argv[3:] else "bf16"
for a in sys.argv[3:]:
    if a in ("xla", "pallas"):
        from sdvar_tpu.ops.attention import set_attention_impl

        set_attention_impl(a)

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
key = jax.random.PRNGKey(0)
print(f"[prof] init VAR-d{depth} params...", flush=True)
t0 = time.time()
params = init_var_params(var_cfg, key, dtype=jnp.bfloat16)
qp = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1))
params = jax.device_put(params)
qp = jax.device_put(qp)
if w8a8:
    from sdvar_tpu.ops.quantization import WEIGHT_KEYS, quantize_var_params

    qparams = quantize_var_params(params, mode="w8a8")
    for k in WEIGHT_KEYS:
        if k in params["blocks"]:
            params["blocks"][k].delete()
    params["head"]["w"].delete()
    params = qparams
    print("[prof] using w8a8 params", flush=True)
print(f"[prof] init done in {time.time()-t0:.1f}s", flush=True)

label = jnp.arange(batch, dtype=jnp.int32) % 1000
samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

print("[prof] compile + warmup...", flush=True)
t0 = time.time()
out = decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp, kv_mode=kv_mode)
out.block_until_ready()
print(f"[prof] warmup done in {time.time()-t0:.1f}s", flush=True)

for _ in range(2):
    t0 = time.time()
    decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp, kv_mode=kv_mode).block_until_ready()
    print(f"[prof] steady-state: {time.time()-t0*1:.3f}s".replace("-", " "), flush=True)
    print(f"[prof] rep {time.time()-t0:.3f}s", flush=True)

logdir = "/tmp/sdvar_prof"
with jax.profiler.trace(logdir):
    decode_all_scales(var_cfg, vae_cfg, params, qp, label, key, samp, kv_mode=kv_mode).block_until_ready()

# find the newest trace json
cands = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
if not cands:
    print("[prof] no trace.json.gz found; files:", flush=True)
    for f in glob.glob(logdir + "/**/*", recursive=True):
        print("   ", f, flush=True)
    sys.exit(1)
path = cands[-1]
print(f"[prof] parsing {path}", flush=True)
with gzip.open(path, "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
# Find TPU device-op events: pid/tid mapping varies; aggregate complete events
# ("ph"=="X") by name on threads whose process is the TPU.
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
    if "TPU" not in pname and "xla" not in pname.lower() and "device" not in pname.lower():
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    bytime[name] += dur
    count[name] += 1
    total += dur

print(f"\n[prof] process names seen: {sorted(set(pid_names.values()))}")
print(f"[prof] total device op time: {total:.1f} ms (may double-count nesting)")
print(f"\n{'ms':>10}  {'n':>5}  op")
for name, ms in sorted(bytime.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{ms:10.2f}  {count[name]:5d}  {name[:110]}")

# Hierarchical attribution: for each while.N (a scale's layer scan), sum the
# device ops whose time window falls inside it (same pid; strictly nested).
whiles = []
ops = []
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "device" not in pname.lower():
        continue
    name = e.get("name", "?")
    ts, dur = e.get("ts", 0), e.get("dur", 0)
    if name.startswith("while."):
        whiles.append((name, ts, ts + dur, dur))
    elif not name.startswith("jit_"):
        ops.append((name, ts, ts + dur, dur))

for wname, w0, w1, wdur in sorted(whiles, key=lambda w: -w[3])[:4]:
    inner = defaultdict(float)
    icount = defaultdict(int)
    for name, t0_, t1_, dur in ops:
        if t0_ >= w0 and t1_ <= w1:
            inner[name] += dur / 1e3
            icount[name] += 1
    tot = sum(inner.values())
    print(f"\n[prof] inside {wname} ({wdur/1e3:.1f} ms; children sum "
          f"{tot:.1f} ms):")
    for name, ms in sorted(inner.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {ms:8.2f}  {icount[name]:4d}  {name[:100]}")
