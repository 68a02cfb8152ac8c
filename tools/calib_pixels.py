"""Calibrated-W8A8 pixel-decoder verdict (round-4 VERDICT ask #3).

Round 4 built an integer-exact INT8 implicit-GEMM conv kernel (2x the bf16
conv rate) but shipped it disabled: per-TENSOR dynamic activation scales
cost 5.6x the bf16 pixel error. This tool adjudicates the round-5 fix —
STATIC per-channel calibration (models/vqvae.calibrate_decoder_w8a8, the
SmoothQuant-style fold in ops/pallas/conv_s8.quantize_site):

  1. (optional, --train-vae N) train the VQVAE N steps on the structured
     dataset so the decoder's GN/conv channel ranges are TRAINED-skewed
     rather than random-flat — the regime per-channel scales exist for
  2. build calibration + eval f_hats by ENCODING held-out structured
     images (realistic latent statistics, not N(0,1) noise)
  3. compare golden-f32 vs NHWC-bf16 vs dynamic-W8A8 vs calibrated-W8A8:
     mean |pixel delta| and B=16 wall time on the real chip

Acceptance (VERDICT): calibrated mean |delta| within ~2x the bf16 class at
the measured worst case, else a documented negative.
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-vae", type=int, default=400,
                    help="VQVAE SGD steps before the verdict (0 = random "
                         "weights, the round-4 worst case)")
    ap.add_argument("--vae-bs", type=int, default=8)
    ap.add_argument("--vae-lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.65)
    ap.add_argument("--cal-batches", type=int, default=4)
    args = ap.parse_args()

    from sdvar_tpu.config import VQVAEConfig, patch_nums_for_reso
    from sdvar_tpu.models import quantizer as Q
    from sdvar_tpu.models import vqvae as VQ
    from sdvar_tpu.train.data import StructuredSynthImages

    cfg = VQVAEConfig(patch_nums=patch_nums_for_reso(256))
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    params = VQ.init_vqvae_params(cfg, k1)

    ds = StructuredSynthImages(reso=256, num_classes=16, length=4096,
                               seed=123)

    def batch(i0, n):
        return jnp.asarray(np.stack([ds[i][0] for i in range(i0, i0 + n)]))

    if args.train_vae:
        from sdvar_tpu.train.vae_trainer import (
            init_vae_train_state,
            vae_train_step,
        )

        st = init_vae_train_state(cfg, params)
        t0 = time.time()
        first = last = None
        for it in range(args.train_vae):
            img = batch((it * args.vae_bs) % 3072, args.vae_bs)
            st, m = vae_train_step(cfg, st, img, jnp.asarray(args.vae_lr))
            if it == 0:
                first = float(m["rec_loss"])
            if it % 50 == 0 or it == args.train_vae - 1:
                last = float(m["rec_loss"])
                print(f"[vae {it}] rec={last:.4f} vq={float(m['vq_loss']):.4f}",
                      flush=True)
        params = st.params
        print(f"[vae] {args.train_vae} steps in {(time.time()-t0)/60:.1f} min "
              f"rec {first:.4f} -> {last:.4f}", flush=True)

    # realistic f_hats: encode held-out structured images
    @jax.jit
    def to_fhat(img):
        return Q.encode(cfg, params["quant"], VQ.img_to_f(cfg, params, img),
                        return_fhat=True)[-1]

    cal = [np.asarray(to_fhat(batch(3072 + i * args.batch, args.batch)))
           for i in range(args.cal_batches)]
    ev = jnp.asarray(np.asarray(
        to_fhat(batch(3072 + args.cal_batches * args.batch, args.batch))))

    gold = np.asarray(VQ.fhat_to_img(cfg, params, ev))

    def run(name, fn):
        out = np.asarray(fn(ev))
        err = float(np.abs(out - gold).mean())
        t = []
        for _ in range(args.iters):
            t0 = time.time()
            float(jnp.sum(fn(ev)))
            t.append(time.time() - t0)
        print(f"[pixels] {name:24s} mean|d|={err:.5f} "
              f"wall={min(t)*1e3:.1f} ms (B={args.batch})", flush=True)
        return err, min(t) * 1e3

    e_bf, t_bf = run("nhwc_bf16", lambda z: VQ.fhat_to_img_nhwc(cfg, params, z))
    e_dy, t_dy = run("w8a8_dynamic", lambda z: VQ.fhat_to_img_nhwc_w8a8(
        cfg, params, z))
    best = (1e9, None, None, None)
    for alpha, min_w in ((args.alpha, 0), (0.75, 0), (0.85, 0),
                         (0.75, 128), (0.9, 128), (0.75, 256)):
        sites = VQ.calibrate_decoder_w8a8(cfg, params, cal, alpha=alpha,
                                          min_w=min_w)
        nq = sum(s is not None for s in sites)
        e, t = run(f"calib a={alpha} w>={min_w} ({nq}q)",
                   lambda z, s=sites: VQ.fhat_to_img_nhwc_w8a8_static(
                       cfg, params, z, s))
        if e < best[0]:
            best = (e, t, alpha, min_w)
    e_st, t_st, b_a, b_w = best
    verdict = "PASS" if e_st <= 2.0 * e_bf else "NEGATIVE"
    print(f"[verdict] {verdict}: best calibrated (alpha={b_a}, min_w={b_w}) "
          f"{e_st:.5f} vs bf16-class {e_bf:.5f} (2x gate {2*e_bf:.5f}); "
          f"dynamic was {e_dy:.5f}; wall bf16 {t_bf:.1f} -> calib "
          f"{t_st:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
