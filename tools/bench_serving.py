"""Continuous-batching serving throughput on the local accelerator.

End-to-end server metric (BASELINE config #5 surface on one chip): requests
with distinct labels/seeds stream into GenerationServer; measures delivered
images/sec INCLUDING the VQVAE image decode (bench.py's headline measures
f_hat-only latent decode), plus latency percentiles and batch occupancy.

Usage: python tools/bench_serving.py [depth] [n_requests] [max_batch] [mode]
       mode: bf16 | w8a8-int8kv (default) | spec | spec-accept | mesh

spec modes (draft d16 + target d[depth], int8 KV): with RANDOM weights the
draft/target top-1 match rate is ~0, so
  - "spec" measures the ACCEPTANCE FLOOR (every window rejected, gamma
    shrink + forced accepts — the worst case the engine can hit), and
  - "spec-accept" (force_accept_all) the CEILING (every drafted scale
    accepted — the ~2x-target-calls-halved best case).
Real-checkpoint acceptance (reference goal: >=0.5/scale) lands between.
"mesh" runs the mesh-mode scheduler on a 1-device mesh (the TP path's
host/sharding overhead; multi-chip ICI scaling needs real chips).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from sdvar_tpu.config import (
    MeshConfig,
    SamplingConfig,
    SpeculativeConfig,
    VARConfig,
    VQVAEConfig,
)
from sdvar_tpu.engine.serving import GenerationServer
from sdvar_tpu.models.var import init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params
from sdvar_tpu.ops.quantization import WEIGHT_KEYS, quantize_var_params

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 96
max_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
mode = sys.argv[4] if len(sys.argv) > 4 else "w8a8-int8kv"
# "-u8" suffix on any mode: device-side uint8 pixel delivery (4x less
# device->host traffic; Result.image becomes (3,H,W) uint8)
deliver = "f32"
if mode.endswith("-u8"):
    deliver, mode = "u8", mode[:-3]

var_cfg = VARConfig(depth=depth)
vae_cfg = VQVAEConfig()
print(f"[serve] VAR-d{depth} {mode} deliver={deliver} max_batch={max_batch}", flush=True)
t0 = time.time()
params = init_var_params(var_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
jax.block_until_ready(params)
vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(1))
print(f"[serve] init {time.time()-t0:.0f}s", flush=True)


def _quantize(p):
    qp = quantize_var_params(p, mode="w8a8")
    for k in WEIGHT_KEYS:
        if k in p["blocks"]:
            p["blocks"][k].delete()
    p["head"]["w"].delete()
    return qp


kv_mode = "bf16"
extra = {}
if mode.startswith("w8a8"):
    params = _quantize(params)
    if mode.endswith("int8kv"):
        kv_mode = "int8"
elif mode.startswith("spec"):
    # draft d16 + target d{depth}, W8A8 weights + int8 KV on BOTH
    # (apples-to-apples vs the w8a8-int8kv baseline row)
    kv_mode = "int8"
    params = _quantize(params)
    draft_cfg = VARConfig(depth=16)
    draft_params = init_var_params(draft_cfg, jax.random.PRNGKey(7),
                                   dtype=jnp.bfloat16)
    jax.block_until_ready(draft_params)
    draft_params = _quantize(draft_params)
    extra = dict(
        draft_cfg=draft_cfg, draft_params=draft_params,
        spec=SpeculativeConfig(
            gamma=3, force_accept_all=mode == "spec-accept"),
    )
    print(f"[serve] draft d16 init done (w8a8; "
          f"force_accept_all={mode == 'spec-accept'})", flush=True)
elif mode == "mesh":
    kv_mode = "int8"
    params = _quantize(params)
    extra = dict(mesh_cfg=MeshConfig(data=1, model=len(jax.devices())))
elif mode == "pixq":
    # w8a8-int8kv latent decode + CALIBRATED W8A8 pixel decoder (round 5):
    # calibrate on f_hats from the real decode path, top-level-only sites
    # (the quality-gate-passing config — BENCHMARKS "Calibrated W8A8").
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.vqvae import calibrate_decoder_w8a8

    params = _quantize(params)
    kv_mode = "int8"
    cal_fh = []
    for i in range(2):
        fh = decode_all_scales(
            var_cfg, vae_cfg, params, vae_params["quant"],
            jnp.arange(8, dtype=jnp.int32) + 100 * i,
            jax.random.PRNGKey(40 + i),
            SamplingConfig(cfg=1.5, top_k=900, top_p=0.96), jnp.bfloat16,
            kv_mode="int8")
        cal_fh.append(np.asarray(fh))
    sites = calibrate_decoder_w8a8(vae_cfg, vae_params, cal_fh,
                                   alpha=0.75, min_w=256)
    extra = dict(pixel_sites=sites)
    print(f"[serve] calibrated pixel sites: "
          f"{sum(s is not None for s in sites)} quantized", flush=True)

srv = GenerationServer(
    var_cfg, vae_cfg, params, vae_params,
    samp=SamplingConfig(cfg=1.5, top_k=900, top_p=0.96),
    max_batch=max_batch, buckets=[max_batch], max_wait_ms=20.0,
    dtype=jnp.bfloat16, kv_mode=kv_mode, deliver=deliver,
    **extra,
)
srv.start()

# warmup (compile): two full buckets SEQUENTIALLY — the second catches any
# input-sharding-driven recompile (cache buffers committed by batch one)
t0 = time.time()
for round_ in range(2):
    warm = [srv.submit(label=i % 1000, seed=round_ * 1000 + i)
            for i in range(max_batch)]
    for rid in warm:
        r = srv.get(rid, timeout=1200)
        assert r.ok, r.error
print(f"[serve] warmup (compile + 2 batches): {time.time()-t0:.1f}s",
      flush=True)

# steady-state: saturating open loop
t0 = time.time()
ids = [srv.submit(label=(i * 7) % 1000, seed=10_000 + i) for i in range(n_req)]
lat = []
for rid in ids:
    r = srv.get(rid, timeout=1200)
    assert r.ok, r.error
    lat.append(r.latency_s)
wall = time.time() - t0
srv.stop()

lat = np.array(sorted(lat))
occ = srv.stats["occupancy_sum"] / max(srv.stats["batches"], 1)
print(f"[serve] d{depth} {mode}(deliver={deliver}): {n_req} imgs in {wall:.2f}s = "
      f"{n_req/wall:.2f} img/s end-to-end (incl. VQVAE decode to pixels)",
      flush=True)
print(f"[serve] latency p50={lat[len(lat)//2]*1e3:.0f} ms "
      f"p95={lat[int(len(lat)*0.95)]*1e3:.0f} ms "
      f"max={lat[-1]*1e3:.0f} ms; occupancy={occ*100:.0f}% "
      f"batches={srv.stats['batches']}", flush=True)
if mode.startswith("spec"):
    tc = srv.stats.get("spec_target_calls", 0)
    dc = srv.stats.get("spec_draft_calls", 0)
    acc = srv.stats.get("spec_accept_count", 0)
    rej = srv.stats.get("spec_reject_count", 0)
    nb = max(srv.stats["batches"], 1)
    print(f"[serve] spec stats: target_calls/batch={tc/nb:.1f} "
          f"draft_calls/batch={dc/nb:.1f} accepted={acc} rejected={rej} "
          f"forced={srv.stats.get('spec_forced_accepts', 0)}", flush=True)
