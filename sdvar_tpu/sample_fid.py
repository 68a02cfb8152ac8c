"""FID sample-generation driver — the reference's evaluation protocol as a
CLI (reference: README.md:151-157: sample 50,000 class-balanced images at
cfg=1.5, top_p=0.96, top_k=900, pack into an .npz for the OpenAI
guided-diffusion FID toolkit against VIRTUAL_imagenet256_labeled.npz).

The reference leaves this step to "a script using utils.misc
create_npz_from_sample_folder"; here it is a first-class pipeline: batched
one-jit decode with donated-cache reuse, class-balanced label schedule
(num_samples/1000 per class), per-sample deterministic seeds, optional W8A8
quantization and INT8 KV cache, direct-to-npz packing (no PNG round trip)
or a PNG folder for the reference's original flow.

Run (random weights exercise the pipeline; pass checkpoints for real FID):
  python -m sdvar_tpu.sample_fid --num 50000 --batch 16 --depth 30 \
      --quant w8a8 --kv int8 --out /tmp/samples.npz \
      [--ckpt-var var_d30.pth --ckpt-vae vae_ch160v4096z32.pth]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig


def balanced_labels(num: int, num_classes: int = 1000) -> np.ndarray:
    """Class-balanced label schedule: floor(num/C) per class, remainder on
    the first classes (the reference samples 50 per class for 50k)."""
    per = num // num_classes
    rem = num - per * num_classes
    counts = np.full((num_classes,), per, np.int64)
    counts[:rem] += 1
    return np.repeat(np.arange(num_classes, dtype=np.int32), counts)


def _pixel_decoder(pixels: str):
    from sdvar_tpu.models import vqvae as VQ

    if pixels == "f32":
        return VQ.fhat_to_img                               # golden protocol
    if pixels == "f32-nhwc":
        return lambda cfg, p, f: VQ.fhat_to_img_nhwc(
            cfg, p, f, dtype=jnp.float32)
    assert pixels == "bf16", pixels
    return VQ.fhat_to_img_nhwc                              # serving decoder


def sample_batches(var_cfg, vae_cfg, var_params, vae_params, labels, batch,
                   samp, dtype=jnp.bfloat16, kv_mode="bf16", seed0=0,
                   log_every=50, pixels="f32"):
    """Yield (B, 3, H, W) [0,1] image batches covering ``labels``.

    Two-deep software pipeline (VERDICT round-3 item 6): a dispatcher
    thread keeps up to 2 decode batches in flight on the device and a
    materializer thread owns the device->host sync, so the consumer's
    host-side packing (npz copy / PNG encode, ~40 ms/img measured) overlaps
    BOTH the next batch's decode and the previous batch's transfer. The
    previous one-deep version (dispatch i+1 then sync i on one thread)
    still serialized packing with dispatch: measured 10.4 img/s vs an 18.3
    ideal at f32 (BENCHMARKS.md FID-pipeline note)."""
    import queue as _queue
    import threading

    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.models.var import KVCache

    if kv_mode == "int8":
        from sdvar_tpu.ops.quantization import QuantizedKVCache

        cache = QuantizedKVCache.create(var_cfg, 2 * batch)
    else:
        cache = KVCache.create(var_cfg, 2 * batch, dtype=dtype)

    to_img = _pixel_decoder(pixels)
    n = len(labels)
    t0 = time.time()
    device_q: "_queue.Queue" = _queue.Queue(maxsize=2)  # async device arrays
    host_q: "_queue.Queue" = _queue.Queue(maxsize=2)    # np arrays
    stop = threading.Event()

    def dispatcher():
        nonlocal cache
        try:
            for off in range(0, n, batch):
                if stop.is_set():
                    return
                chunk = labels[off:off + batch]
                pad = batch - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,), np.int32)])
                # per-sample seeds -> batch-composition-independent outputs
                seeds = (seed0 + off + np.arange(batch)).astype(np.uint32)
                keys = jax.vmap(jax.random.key)(jnp.asarray(seeds))
                f_hat, cache = decode_all_scales(
                    var_cfg, vae_cfg, var_params, vae_params["quant"],
                    jnp.asarray(chunk, jnp.int32), keys, samp, dtype,
                    kv_mode=kv_mode, cache=cache, return_cache=True,
                )
                img_d = (to_img(vae_cfg, vae_params, f_hat) + 1.0) * 0.5
                device_q.put((img_d, pad, min(off + batch, n)))
            device_q.put(None)
        except BaseException as e:  # surfaced to the consumer
            device_q.put(e)

    def materializer():
        try:
            while True:
                item = device_q.get()
                if item is None or isinstance(item, BaseException):
                    host_q.put(item)
                    return
                img_d, pad, done = item
                img = np.asarray(img_d)  # device -> host sync
                if pad:
                    img = img[:-pad]
                host_q.put((img, done))
        except BaseException as e:
            host_q.put(e)

    threads = [threading.Thread(target=dispatcher, daemon=True),
               threading.Thread(target=materializer, daemon=True)]
    for t in threads:
        t.start()
    bi = 0
    try:
        while True:
            item = host_q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            img, done = item
            if log_every and bi % log_every == 0:
                rate = done / max(time.time() - t0, 1e-9)
                print(f"[fid-sample] {done}/{n} ({rate:.1f} img/s)",
                      flush=True)
            bi += 1
            yield img
    finally:
        stop.set()
        # unblock threads parked on full queues, then let them exit
        for q in (device_q, host_q):
            try:
                q.get_nowait()
            except _queue.Empty:
                pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--patch-nums", type=str, default="1_2_3_4_5_6_8_10_13_16")
    ap.add_argument("--cfg", type=float, default=1.5)       # FID protocol
    ap.add_argument("--top-k", type=int, default=900)
    ap.add_argument("--top-p", type=float, default=0.96)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", choices=["none", "w8", "w8a8"], default="none")
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--pixels", choices=["f32", "f32-nhwc", "bf16"],
                    default="f32",
                    help="pixel decoder: f32 = golden NCHW FID protocol; "
                         "f32-nhwc = channels-last f32 (faster, conv-"
                         "reassociation noise only); bf16 = channels-last "
                         "serving decoder (fastest; mean delta ~1.5 8-bit "
                         "steps — pipeline shakeouts, keep f32 for "
                         "reported FID)")
    ap.add_argument("--out", type=str, default="/tmp/sdvar_samples.npz")
    ap.add_argument("--png-dir", type=str, default=None,
                    help="also write PNGs (reference flow) to this folder")
    ap.add_argument("--ckpt-var", type=str, default=None)
    ap.add_argument("--ckpt-vae", type=str, default=None)
    args = ap.parse_args()

    pns = tuple(int(p) for p in args.patch_nums.split("_"))
    var_cfg = VARConfig(depth=args.depth, patch_nums=pns)
    vae_cfg = VQVAEConfig(patch_nums=pns)
    samp = SamplingConfig(cfg=args.cfg, top_k=args.top_k, top_p=args.top_p)

    if args.ckpt_var:
        import torch

        from sdvar_tpu.utils.torch_port import (
            var_params_from_torch,
            vqvae_params_from_torch,
        )

        var_params = var_params_from_torch(
            var_cfg, torch.load(args.ckpt_var, map_location="cpu"))
        vae_params = vqvae_params_from_torch(
            vae_cfg, torch.load(args.ckpt_vae, map_location="cpu"))
    else:
        print("[fid-sample] no checkpoints: random weights (pipeline "
              "exercise only — FID numbers meaningless)", flush=True)
        from sdvar_tpu.models.quantizer import init_quantizer_params
        from sdvar_tpu.models.var import init_var_params
        from sdvar_tpu.models.vqvae import init_vqvae_params

        key = jax.random.PRNGKey(args.seed)
        var_params = init_var_params(var_cfg, key, dtype=jnp.bfloat16)
        vae_params = init_vqvae_params(vae_cfg, jax.random.fold_in(key, 1))
        vae_params["quant"] = init_quantizer_params(
            vae_cfg, jax.random.fold_in(key, 2), eini=1.0)

    if args.quant != "none":
        from sdvar_tpu.ops.quantization import quantize_var_params

        var_params = quantize_var_params(var_params, mode=args.quant)

    labels = balanced_labels(args.num)
    batches = sample_batches(
        var_cfg, vae_cfg, var_params, vae_params, labels, args.batch, samp,
        kv_mode=args.kv, seed0=args.seed, pixels=args.pixels,
    )

    from sdvar_tpu.utils.fid import create_npz_from_arrays, save_sample_pngs

    t0 = time.time()
    if args.png_dir:
        def tee():
            idx = 0
            for b in batches:
                save_sample_pngs(b, args.png_dir, start_idx=idx)
                idx += b.shape[0]
                yield b

        create_npz_from_arrays(tee(), args.out, num=args.num)
    else:
        create_npz_from_arrays(batches, args.out, num=args.num)
    import resource

    rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    wall = time.time() - t0
    print(f"[fid-sample] DONE: {args.num} samples in {wall/60:.1f} min "
          f"({args.num/wall:.1f} img/s e2e incl. pixel decode + npz pack); "
          f"peak host RSS {rss_gib:.1f} GiB -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
