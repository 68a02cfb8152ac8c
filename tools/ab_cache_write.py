"""A/B the in-kernel cache-write attention (pallas_attention_cache_write)
against the XLA dynamic-update-slice path, and FP8 vs W8 weight storage.

Run one configuration per process (the cache-kernel switch is read at trace
time and jit caches would otherwise go stale):

    python tools/ab_cache_write.py --kv bf16 --cache-kernel 0
    python tools/ab_cache_write.py --kv bf16 --cache-kernel 1
    python tools/ab_cache_write.py --kv int8 --w8a8 --cache-kernel {0,1}
    python tools/ab_cache_write.py --weights {w8,fp8}

Results land in BENCHMARKS.md by hand; the default stays on the winner.
"""

from __future__ import annotations

import argparse
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--w8a8", action="store_true")
    ap.add_argument("--weights", choices=["bf16", "w8", "fp8"],
                    default="bf16")
    ap.add_argument("--cache-kernel", type=int, default=0)
    ap.add_argument("--reso", type=int, default=256,
                    help="patch_nums preset: 256 (L=680), 512 (L=2240), "
                         "1024 (L=9451)")
    args = ap.parse_args()

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

    set_cache_kernel(bool(args.cache_kernel))

    pns = patch_nums_for_reso(args.reso)
    var_cfg = VARConfig(depth=args.depth, patch_nums=pns)
    vae_cfg = VQVAEConfig(patch_nums=pns)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0),
                             dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    quant = init_quantizer_params(vae_cfg, jax.random.PRNGKey(1), eini=1.0)

    if args.w8a8 or args.weights in ("w8", "fp8"):
        from sdvar_tpu.ops.quantization import (
            WEIGHT_KEYS,
            quantize_var_params,
        )

        mode = "w8a8" if args.w8a8 else args.weights
        qparams = quantize_var_params(params, mode=mode)
        for k in WEIGHT_KEYS:
            if k in params["blocks"]:
                params["blocks"][k].delete()
        if qparams["head"]["w"] is not params["head"]["w"]:
            params["head"]["w"].delete()  # fp8 keeps the bf16 head
        params = qparams

    label = jnp.zeros((args.batch,), jnp.int32)
    samp = SamplingConfig(cfg=1.5, top_k=900, top_p=0.96)

    def make_cache():
        if args.kv == "int8":
            from sdvar_tpu.ops.quantization import QuantizedKVCache

            return QuantizedKVCache.create(var_cfg, 2 * args.batch)
        return KVCache.create(var_cfg, 2 * args.batch)

    cache = make_cache()
    t0 = time.time()
    f_hat, cache = decode_all_scales(
        var_cfg, vae_cfg, params, quant, label, jax.random.PRNGKey(1), samp,
        jnp.bfloat16, kv_mode=args.kv, cache=cache, return_cache=True)
    float(jnp.sum(f_hat))
    log(f"[ab] compile+first: {time.time()-t0:.1f}s")
    times = []
    for i in range(args.iters):
        t0 = time.time()
        f_hat, cache = decode_all_scales(
            var_cfg, vae_cfg, params, quant, label, jax.random.PRNGKey(2 + i),
            samp, jnp.bfloat16, kv_mode=args.kv, cache=cache,
            return_cache=True)
        float(jnp.sum(f_hat))
        times.append(time.time() - t0)
    best = min(times)
    tag = (f"d{args.depth} reso={args.reso} (L={var_cfg.L}) B={args.batch} "
           f"kv={args.kv} weights={'w8a8' if args.w8a8 else args.weights} "
           f"cache_kernel={bool(args.cache_kernel)}")
    print(f"[ab] {tag}: {best*1000:.1f} ms/batch, "
          f"{args.batch/best:.2f} img/s "
          f"(times={['%.3f' % t for t in times]})", flush=True)


if __name__ == "__main__":
    main()
