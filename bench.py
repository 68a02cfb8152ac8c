"""Benchmark harness: VAR decode throughput on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline: VAR-d30 256px images/sec, baseline KV-cached CFG decode, bf16,
batch 8 (BASELINE.json configs #1-3; reference decode loop:
models/var.py:127-215). vs_baseline compares against an A100 PyTorch
estimate for the same config documented below.

Extra diagnostics (per-config numbers, speculative stats) go to stderr so
stdout stays a single JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# A100 baseline: ESTIMATED, not measured (no GPU in this environment; the
# reference repo commits no timings — benchmarks/ is gitignored). Two
# estimates with provenance, both labeled wherever the multiple appears:
#
# 1. Reference stack as-is (eager PyTorch, per-scale Python loop, no CUDA
#    graphs): ~2.0 img/s. Derivation: model zoo lists d30 at relative cost
#    1.0 vs d16 at 0.4 (README.md:89-92); public A100 runs of eager VAR-d16
#    report ~5 img/s batched => d30 ~2 img/s. This is the "A100 PyTorch
#    baseline" BASELINE.json names.
#
# 2. Optimized-A100 roofline bound (what a perfect implementation could do,
#    fp16, batch 16): per image the CFG-doubled decode moves ~5.7 TFLOPs
#    (2 x 2.0e9 params x 680 tokens x 2 for CFG, + ~0.2 TF attention);
#    B=16 => 91 TF/batch. A100 fp16 peak 312 TFLOP/s => 292 ms/batch at
#    100% MFU = 54 img/s ceiling; at a strong 40% sustained MFU ~= 22 img/s.
#    Weight traffic (40 GB per 10 forwards / 2 TB/s = 20 ms) is not the
#    binding constraint at this batch.
#
# The headline vs_baseline uses (1) to match BASELINE.json's framing; stderr
# also reports the multiple against (2) so the claim can't lean on a weak
# baseline unnoticed.
A100_D30_IMGS_PER_SEC = 2.0          # estimated, eager reference stack
A100_D30_ROOFLINE_IMGS_PER_SEC = 22.0  # estimated, 40%-MFU optimized bound


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:
        log(f"[bench] compile cache unavailable: {e}")


def bench_decode(depth: int, batch: int, iters: int = 4, dtype_name="bfloat16",
                 w8a8: bool = False, kv_mode: str = "bf16"):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import KVCache, init_var_params

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    var_cfg = VARConfig(depth=depth)
    vae_cfg = VQVAEConfig()
    key = jax.random.PRNGKey(0)
    log(f"[bench] init VAR-d{depth} params ({dtype_name})...")
    t0 = time.time()
    params = init_var_params(var_cfg, key, dtype=dtype)
    jax.block_until_ready(params)
    log(f"[bench] init done in {time.time()-t0:.0f}s")
    quant = init_quantizer_params(vae_cfg, key, eini=1.0)
    if w8a8:
        from sdvar_tpu.ops.quantization import WEIGHT_KEYS, quantize_var_params

        qparams = quantize_var_params(params, mode="w8a8")
        for k in WEIGHT_KEYS:  # free the replaced fp weights (HBM headroom)
            if k in params["blocks"]:
                params["blocks"][k].delete()
        params["head"]["w"].delete()
        params = qparams
    label = jnp.zeros((batch,), jnp.int32)
    samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

    def make_cache():
        if kv_mode == "int8":
            from sdvar_tpu.ops.quantization import QuantizedKVCache

            return QuantizedKVCache.create(var_cfg, 2 * batch)
        return KVCache.create(var_cfg, 2 * batch)

    def sync(x):
        # force a device->host scalar transfer: under the axon remote
        # backend, block_until_ready can return before Pallas-terminated
        # programs finish (measured 0.5 "ms" for a 470 ms decode); pulling
        # a reduction to host is the reliable completion barrier.
        return float(jnp.sum(x))

    cache = make_cache()  # reused (donated) across calls: serving hot loop
    t0 = time.time()
    f_hat, cache = decode_all_scales(
        var_cfg, vae_cfg, params, quant, label, jax.random.PRNGKey(1), samp,
        dtype, kv_mode=kv_mode, cache=cache, return_cache=True)
    sync(f_hat)
    log(f"[bench] d{depth} compile+first run: {time.time()-t0:.1f}s")

    times = []
    for i in range(iters):
        t0 = time.time()
        f_hat, cache = decode_all_scales(
            var_cfg, vae_cfg, params, quant, label, jax.random.PRNGKey(2 + i),
            samp, dtype, kv_mode=kv_mode, cache=cache, return_cache=True)
        sync(f_hat)
        times.append(time.time() - t0)
    best = min(times)
    ips = batch / best
    mode = ("w8a8" if w8a8 else dtype_name) + (
        f"+kv_{kv_mode}" if kv_mode != "bf16" else "")
    log(f"[bench] d{depth} B={batch} {mode}: {best*1000:.1f} ms/batch, "
        f"{ips:.3f} img/s (times={['%.3f' % t for t in times]})")
    return ips


def main():
    depth = 30
    # headline = BASELINE.json config #3: W8A8 INT8 weights + INT8 KV cache
    # (per-token dynamic activation quant on the 2x int8 MXU path; dequant
    # fused into the Pallas attention kernel). Quality gate: token agreement
    # vs bf16 per benchmark_cli --mode quant (BENCHMARKS.md).
    ips = None
    mode = "W8A8 + INT8-KV decode"
    # B=32 first: best measured throughput config (42.5 vs 41.6 img/s at
    # B=16, BENCHMARKS.md round-4 decode table — round-4 VERDICT Weak #4
    # asked for the headline to report the best measured batch); B=16 and
    # below remain as OOM/platform fallbacks.
    for batch, w8a8, kv in ((32, True, "int8"), (16, True, "int8"),
                            (16, False, "bf16"), (8, False, "bf16"),
                            (2, False, "bf16")):
        try:
            ips = bench_decode(depth, batch, w8a8=w8a8, kv_mode=kv)
            if not w8a8:
                mode = "baseline CFG decode, bf16"
            break
        except Exception as e:  # OOM or platform issue: fall back
            log(f"[bench] d30 B={batch} {'w8a8' if w8a8 else 'bf16'} failed "
                f"({type(e).__name__}: {e}); retrying next config")
    if ips is None:
        log("[bench] d30 failed entirely; falling back to d16")
        ips = bench_decode(16, 8)
        print(json.dumps({
            "metric": "VAR-d16 256px images/sec (baseline CFG decode, bf16)",
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / (A100_D30_IMGS_PER_SEC / 0.4), 3),
        }))
        return
    try:  # diagnostic secondary config: plain bf16 decode
        ips_bf16 = bench_decode(depth, 16)
        log(f"[bench] secondary: d30 B=16 bf16 {ips_bf16:.2f} img/s "
            f"({ips_bf16 / A100_D30_IMGS_PER_SEC:.1f}x est. eager baseline)")
    except Exception as e:
        log(f"[bench] bf16 secondary failed: {type(e).__name__}: {e}")
    log(f"[bench] vs estimated baselines: {ips / A100_D30_IMGS_PER_SEC:.1f}x "
        f"eager-A100 (~{A100_D30_IMGS_PER_SEC} img/s), "
        f"{ips / A100_D30_ROOFLINE_IMGS_PER_SEC:.1f}x optimized-A100 "
        f"roofline (~{A100_D30_ROOFLINE_IMGS_PER_SEC} img/s @40% MFU)")
    print(json.dumps({
        "metric": f"VAR-d30 256px images/sec ({mode}; baseline est., "
                  "see bench.py provenance)",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_D30_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
