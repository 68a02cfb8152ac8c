"""Small-batch LATENCY: sequential vs speculative decode at B=1/2/4.

VERDICT round-3 item 3: batched speculation loses THROUGHPUT even at the
100%-acceptance ceiling (BENCHMARKS.md serving bracket), so its surviving
value claim is interactive latency — which had only been measured at
batch 8/16. This tool measures per-image wall-clock (min + p50 over reps)
for:

  - seq:      baseline one-jit 10-scale decode (target only)
  - spec:     draft d16 + target, acceptance FLOOR (random weights -> ~0
              top-1 match; every window rejected)
  - spec-acc: acceptance CEILING (force_accept_all; the reference's >=50%
              match regime lands between floor and ceiling)

Reference claim under test: 1.3-1.7x end-to-end speedup
(/root/reference/PROJECT_STATUS_SUMMARY.md:33, sdvar_colab_test.py:267-331).

Usage: python tools/bench_latency.py [target_depth] [reps] [quant]
       quant: int8 (default; w8a8 weights + int8 KV) | bf16
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
    SamplingConfig,
    SpeculativeConfig,
    VARConfig,
    VQVAEConfig,
)
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.engine.speculative import SpeculativeEngine
from sdvar_tpu.models.var import KVCache, init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params
from sdvar_tpu.ops.quantization import QuantizedKVCache, quantize_var_params


def sync(x):
    return float(jnp.sum(x[..., :2, :2]))


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    quant = sys.argv[3] if len(sys.argv) > 3 else "int8"
    kv_mode = "int8" if quant == "int8" else "bf16"

    pns = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
    vae_cfg = VQVAEConfig(patch_nums=pns)
    tgt_cfg = VARConfig(depth=depth, patch_nums=pns)
    drf_cfg = VARConfig(depth=16, patch_nums=pns)
    samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

    key = jax.random.PRNGKey(0)
    vae_params = init_vqvae_params(vae_cfg, key)
    tgt_params = init_var_params(tgt_cfg, jax.random.fold_in(key, 1),
                                 dtype=jnp.bfloat16)
    drf_params = init_var_params(drf_cfg, jax.random.fold_in(key, 2),
                                 dtype=jnp.bfloat16)
    if quant == "int8":
        tgt_params = quantize_var_params(tgt_params, mode="w8a8")
        drf_params = quantize_var_params(drf_params, mode="w8a8")

    print(f"[latency] d16 draft + d{depth} target, {quant} "
          f"(kv={kv_mode}), reps={reps}", flush=True)

    results = {}
    for B in (1, 2, 4):
        labels = jnp.arange(B, dtype=jnp.int32) * 37 % 1000
        keys = jax.vmap(jax.random.key)(
            jnp.arange(B, dtype=jnp.uint32) + 7)

        # sequential baseline with donated-cache reuse (serving hot path)
        if kv_mode == "int8":
            cache = QuantizedKVCache.create(tgt_cfg, 2 * B)
        else:
            cache = KVCache.create(tgt_cfg, 2 * B, dtype=jnp.bfloat16)

        def run_seq():
            nonlocal cache
            f_hat, cache = decode_all_scales(
                tgt_cfg, vae_cfg, tgt_params, vae_params["quant"],
                labels, keys, samp, jnp.bfloat16, kv_mode=kv_mode,
                cache=cache, return_cache=True)
            return f_hat

        engine = SpeculativeEngine(
            vae_cfg, drf_cfg, tgt_cfg, vae_params, drf_params, tgt_params,
            dtype=jnp.bfloat16, kv_mode=kv_mode)

        def mk_spec(force):
            sc = SpeculativeConfig(gamma=3, force_accept_all=force)

            def run():
                f_hat, _ = engine.generate_speculative(
                    labels, keys, sc, samp)
                return f_hat

            return run

        for name, fn in (("seq", run_seq),
                         ("spec-floor", mk_spec(False)),
                         ("spec-ceil", mk_spec(True))):
            t0 = time.time()
            sync(fn())
            warm = time.time() - t0
            times = []
            for _ in range(reps):
                t0 = time.time()
                sync(fn())
                times.append(time.time() - t0)
            ts = np.asarray(times) * 1e3
            best, p50, p90 = ts.min(), np.percentile(ts, 50), np.percentile(ts, 90)
            results[(B, name)] = p50
            print(f"[latency] B={B} {name:10s}: min {best:7.1f} ms  "
                  f"p50 {p50:7.1f}  p90 {p90:7.1f}  "
                  f"({B / (p50 / 1e3):5.2f} img/s at p50; warm {warm:.0f}s)",
                  flush=True)
        if (B, "seq") in results:
            s = results[(B, "seq")]
            print(f"[latency] B={B} speedup vs seq: "
                  f"floor {s / results[(B, 'spec-floor')]:.2f}x  "
                  f"ceiling {s / results[(B, 'spec-ceil')]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
