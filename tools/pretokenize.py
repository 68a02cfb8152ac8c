"""Pre-tokenize an ImageNet folder into token-id shards (one-time cost).

The reference re-encodes every image through the frozen VQVAE inside every
training step forever (reference: trainer.py:105-107); this tool pays that
cost once and training then runs off stored ids at ~2x step throughput
(BENCHMARKS.md pre-tokenized training table).

Usage:
  python tools/pretokenize.py --data /path/to/imagenet/train \
      --out /path/to/tokens --reso 256 --passes 4 \
      [--ckpt-vae vae_ch160v4096z32.pth] [--bf16] [--batch 32]

Then train with:
  python -m sdvar_tpu.train.train_loop --tokens /path/to/tokens --depth 16

Without --ckpt-vae the VQVAE is seed-initialized (pipeline exercises/tests);
pass the real checkpoint for actual training. Resumable: re-running skips
completed shards.
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default=None,
                    help="ImageNet train folder; synthetic data when absent")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--reso", type=int, default=256)
    ap.add_argument("--passes", type=int, default=1,
                    help="augmentation draws stored per image (crop/flip "
                         "seeds); training rotates them per epoch")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--shard-size", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 tokenizer encoder (2x faster; see "
                         "models/vqvae.img_to_f_bf16)")
    ap.add_argument("--hflip", action="store_true")
    ap.add_argument("--synthetic-len", type=int, default=1024)
    ap.add_argument("--ckpt-vae", type=str, default=None)
    args = ap.parse_args()

    from sdvar_tpu.config import VQVAEConfig, patch_nums_for_reso
    from sdvar_tpu.train.pretokenize import (
        build_token_datasets_for_passes,
        pretokenize_dataset,
    )

    vae_cfg = VQVAEConfig(patch_nums=patch_nums_for_reso(args.reso))
    if args.ckpt_vae:
        import torch

        from sdvar_tpu.utils.torch_port import vqvae_params_from_torch

        vae_params = vqvae_params_from_torch(
            vae_cfg, torch.load(args.ckpt_vae, map_location="cpu"))
    else:
        from sdvar_tpu.models.vqvae import init_vqvae_params

        print("[pretokenize] no --ckpt-vae: seed-initialized VQVAE "
              "(pipeline exercise only)", flush=True)
        vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(args.seed))

    datasets = build_token_datasets_for_passes(
        args.data, args.reso, args.passes, seed=args.seed, hflip=args.hflip,
        synthetic_len=args.synthetic_len,
    )
    m = pretokenize_dataset(
        vae_cfg, vae_params, datasets, args.out, batch=args.batch,
        shard_size=args.shard_size, tokenize_bf16=args.bf16,
    )
    size_mb = m["num_samples"] * m["passes"] * m["L"] * 2 / 2**20
    print(f"[pretokenize] DONE: {m['num_samples']} samples x {m['passes']} "
          f"passes -> {m['num_shards']} shards (~{size_mb:.0f} MiB) in "
          f"{args.out}", flush=True)


if __name__ == "__main__":
    main()
