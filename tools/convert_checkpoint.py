#!/usr/bin/env python
"""Convert reference PyTorch model-zoo checkpoints into sdvar_tpu param trees.

Supports the published VAR family (var_d16/d20/d24/d30.pth — reference
README.md:84-94) and the shared tokenizer (vae_ch160v4096z32.pth), producing
npz checkpoints loadable by sdvar_tpu.train.checkpoint.load_checkpoint.

Usage:
  python tools/convert_checkpoint.py --var var_d16.pth --depth 16 --out d16/
  python tools/convert_checkpoint.py --vae vae_ch160v4096z32.pth --out vae/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", type=str, default=None, help="VAR .pth path")
    ap.add_argument("--vae", type=str, default=None, help="VQVAE .pth path")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--patch-nums", type=str, default="1_2_3_4_5_6_8_10_13_16")
    ap.add_argument("--shared-aln", action="store_true")
    ap.add_argument("--no-attn-l2", action="store_true")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    import torch

    from sdvar_tpu.config import VARConfig, VQVAEConfig
    from sdvar_tpu.train.checkpoint import save_checkpoint
    from sdvar_tpu.utils.torch_port import (
        var_params_from_torch,
        vqvae_params_from_torch,
    )

    pns = tuple(int(p) for p in args.patch_nums.split("_"))
    os.makedirs(args.out, exist_ok=True)

    if args.var:
        sd = torch.load(args.var, map_location="cpu")
        if isinstance(sd, dict) and "trainer" in sd:  # training ckpt wrapper
            sd = sd["trainer"]["var_wo_ddp"]
        cfg = VARConfig(depth=args.depth, patch_nums=pns,
                        shared_aln=args.shared_aln,
                        attn_l2_norm=not args.no_attn_l2)
        params = var_params_from_torch(cfg, sd)
        save_checkpoint(args.out, 0, params,
                        meta={"kind": "var", "depth": args.depth,
                              "patch_nums": list(pns)})
        print(f"[convert] VAR d{args.depth} -> {args.out}")

    if args.vae:
        sd = torch.load(args.vae, map_location="cpu")
        cfg = VQVAEConfig(patch_nums=pns)
        params = vqvae_params_from_torch(cfg, sd)
        save_checkpoint(args.out, 0, params,
                        meta={"kind": "vqvae", "patch_nums": list(pns)})
        print(f"[convert] VQVAE -> {args.out}")


if __name__ == "__main__":
    main()
