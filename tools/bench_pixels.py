"""Pixel-decoder (VQVAE CNN) benchmark: NCHW vs channels-last NHWC, f32 vs
bf16, on the local accelerator.

The decoder is ~22% of serving e2e and 4x de-rates the FID pipeline
(BENCHMARKS.md pixel-decoder cost: 488 ms f32 / 111 ms bf16 per B=16 batch,
~12% of bf16 peak) — VERDICT round-3 item 2.

Usage: python tools/bench_pixels.py [B] [iters]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")


def sync(x):
    # device->host scalar sync (axon block_until_ready can return early)
    return float(jnp.sum(x[0, 0, :2, :2]))


def main():
    B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16
    iters = int(_sys.argv[2]) if len(_sys.argv) > 2 else 5

    from sdvar_tpu.config import VQVAEConfig
    from sdvar_tpu.models import vqvae as VQ
    from sdvar_tpu.models.vqvae import init_vqvae_params

    vae_cfg = VQVAEConfig()  # 256px production config (ch=160, z=32)
    params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(0))
    f_hat = jax.random.normal(jax.random.PRNGKey(1), (B, vae_cfg.z_channels,
                                                      16, 16))
    variants = {
        "nchw-f32 (golden)": lambda: VQ.fhat_to_img(vae_cfg, params, f_hat),
        "nchw-bf16": lambda: VQ.fhat_to_img_bf16(vae_cfg, params, f_hat),
        "nhwc-f32": lambda: VQ.fhat_to_img_nhwc(vae_cfg, params, f_hat,
                                                dtype=jnp.float32),
        "nhwc-f32-3x": lambda: VQ.fhat_to_img_nhwc(vae_cfg, params, f_hat,
                                                   dtype=jnp.float32,
                                                   precision="high"),
        "nhwc-bf16": lambda: VQ.fhat_to_img_nhwc(vae_cfg, params, f_hat,
                                                 dtype=jnp.bfloat16),
        # experimental int8 conv kernel path — quality-traded, opt-in
        # (ops/pallas/conv_s8.py docstring has the verdict)
        "nhwc-w8a8": lambda: VQ.fhat_to_img_nhwc_w8a8(vae_cfg, params,
                                                      f_hat),
    }
    # calibrated static per-channel W8A8 (round-5; quality verdict on
    # trained weights lives in tools/calib_pixels.py — here: wall time)
    sites = VQ.calibrate_decoder_w8a8(vae_cfg, params, [f_hat])
    variants["nhwc-w8a8-calib"] = lambda: VQ.fhat_to_img_nhwc_w8a8_static(
        vae_cfg, params, f_hat, sites)
    gold = None
    for name, fn in variants.items():
        t0 = time.time()
        out = fn()
        sync(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            sync(fn())
            times.append(time.time() - t0)
        best = min(times)
        a = np.asarray(out)
        if gold is None:
            gold = a
        print(f"[pixels] {name:18s} B={B}: {best*1e3:7.1f} ms "
              f"({B/best:6.1f} img/s)  mean|d|={np.abs(a-gold).mean():.4f} "
              f"max|d|={np.abs(a-gold).max():.4f} (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
