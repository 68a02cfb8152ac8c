"""One-process TPU measurement sweep (round-2):

  phase A: d30 B=16 bf16-KV decode, cache-write kernel OFF vs ON (A/B for
           pallas_attention_cache_write — VERDICT item #7)
  phase B: d30 B=16 W8A8 + INT8-KV, kernel OFF vs ON (headline config)
  phase C: d30 B=16 weight-only W8 vs FP8 (e4m3), bf16 KV  (item #9)
  phase D: d30 B=32 W8A8 + INT8-KV (throughput scaling probe)
  phase E: 1024px preset (L=9451) depth-8 B=2 bf16 full decode (item #8)

Single process so the 2B-param init and shared compiles amortize; the
cache-kernel toggle is trace-time state, so jax.clear_caches() runs between
OFF and ON phases. Results print immediately (flush) — read the log as it
goes.
"""

from __future__ import annotations

import sys
import time


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")

    from sdvar_tpu.config import (
        SamplingConfig,
        VARConfig,
        VQVAEConfig,
        patch_nums_for_reso,
    )
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import KVCache, init_var_params
    from sdvar_tpu.ops.attention import set_cache_kernel
    from sdvar_tpu.ops.quantization import (
        QuantizedKVCache,
        quantize_var_params,
    )

    samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

    def bench(tag, var_cfg, vae_cfg, params, quant, batch, kv, iters=4):
        label = jnp.zeros((batch,), jnp.int32)
        if kv == "int8":
            cache = QuantizedKVCache.create(var_cfg, 2 * batch)
        else:
            cache = KVCache.create(var_cfg, 2 * batch)
        t0 = time.time()
        f_hat, cache = decode_all_scales(
            var_cfg, vae_cfg, params, quant, label, jax.random.PRNGKey(1),
            samp, jnp.bfloat16, kv_mode=kv, cache=cache, return_cache=True)
        float(jnp.sum(f_hat))
        log(f"[sweep] {tag}: compile+first {time.time()-t0:.1f}s")
        times = []
        for i in range(iters):
            t0 = time.time()
            f_hat, cache = decode_all_scales(
                var_cfg, vae_cfg, params, quant, label,
                jax.random.PRNGKey(2 + i), samp, jnp.bfloat16, kv_mode=kv,
                cache=cache, return_cache=True)
            float(jnp.sum(f_hat))
            times.append(time.time() - t0)
        best = min(times)
        log(f"[sweep] {tag}: {best*1000:.1f} ms/batch, {batch/best:.2f} "
            f"img/s (times={['%.3f' % t for t in times]})")
        del cache
        return best

    var_cfg = VARConfig(depth=30)
    vae_cfg = VQVAEConfig()
    t0 = time.time()
    params = init_var_params(var_cfg, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1), eini=1.0)
    log(f"[sweep] d30 init {time.time()-t0:.0f}s")

    base_ids = {id(a) for a in jax.tree.leaves(params)}

    def free(tree):
        # only leaves NOT shared with the resident bf16 params (quantized
        # trees alias every non-quantized leaf)
        for a in jax.tree.leaves(tree):
            if id(a) not in base_ids and hasattr(a, "delete"):
                a.delete()

    # HBM budget: d30 bf16 params 4 GB stay resident; ONE quantized copy
    # (~2 GB) + ONE cache (bf16 B=16: 5 GB / int8: 2.6 GB) at a time.
    set_cache_kernel(False)
    bench("A-off d30 B=16 bf16 kv=bf16", var_cfg, vae_cfg, params, quant,
          16, "bf16")
    for mode in ("w8", "fp8"):
        qp = quantize_var_params(params, mode=mode)
        bench(f"C d30 B=16 {mode} kv=bf16", var_cfg, vae_cfg, qp, quant,
              16, "bf16")
        free(qp)
    w8a8 = quantize_var_params(params, mode="w8a8")
    bench("B-off d30 B=16 w8a8 kv=int8", var_cfg, vae_cfg, w8a8, quant,
          16, "int8")
    for B in (32, 64):
        try:
            bench(f"D d30 B={B} w8a8 kv=int8", var_cfg, vae_cfg, w8a8,
                  quant, B, "int8")
        except Exception as e:
            log(f"[sweep] D{B} failed: {type(e).__name__}: {e}")

    # ---- ON phases (cache-write kernel) -----------------------------------
    set_cache_kernel(True)
    jax.clear_caches()
    try:
        bench("A-on d30 B=16 bf16 kv=bf16 cachewrite", var_cfg, vae_cfg,
              params, quant, 16, "bf16")
        bench("B-on d30 B=16 w8a8 kv=int8 cachewrite", var_cfg, vae_cfg,
              w8a8, quant, 16, "int8")
    except Exception as e:
        log(f"[sweep] cache-write phases failed: {type(e).__name__}: {e}")
    set_cache_kernel(False)
    jax.clear_caches()

    # ---- 1024px preset ----------------------------------------------------
    free(w8a8)
    for a in jax.tree.leaves(params):
        if hasattr(a, "delete"):
            a.delete()
    del w8a8, params
    pns = patch_nums_for_reso(1024)
    var1k = VARConfig(depth=8, patch_nums=pns)
    vae1k = VQVAEConfig(patch_nums=pns)
    p1k = init_var_params(var1k, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    jax.block_until_ready(p1k)
    q1k = init_quantizer_params(vae1k, jax.random.PRNGKey(1), eini=1.0)
    try:
        bench("E d8 1024px (L=9451) B=2 bf16", var1k, vae1k, p1k, q1k,
              2, "bf16", iters=3)
    except Exception as e:
        log(f"[sweep] E failed: {type(e).__name__}: {e}")
    log("[sweep] DONE")


if __name__ == "__main__":
    main()
