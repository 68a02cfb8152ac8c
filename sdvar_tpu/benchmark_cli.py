"""Benchmark & evaluation harness — the reference's Colab notebook
(sdvar_colab_test.py) reborn as a CLI.

Capability parity (SURVEY.md §2.1 #23):
  - γ∈{1,2,3} sweeps with wall-clock timing + acceptance telemetry
    (sdvar_colab_test.py:189-260)
  - sequential-vs-speculative comparison with target-call accounting
    (:267-331; theoretical 10 vs ~5 target calls)
  - quality check vs plain target-VAR output: latent MSE + token agreement
    (:338-398)
  - handoff sd_mask ablation sweep (models/var.py:777-824)

Checkpoints: pass --ckpt-vae/--ckpt-draft/--ckpt-target to load reference
PyTorch model-zoo weights (vae_ch160v4096z32.pth, var_d16.pth, var_d30.pth)
via utils/torch_port; without them, random weights exercise the full compute
path (timings valid, quality numbers meaningless).

Run:  python -m sdvar_tpu.benchmark_cli --mode gamma --depth-draft 16 \
          --depth-target 30 --batch 8
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import (
    SamplingConfig,
    SpeculativeConfig,
    VARConfig,
    VQVAEConfig,
)
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.engine.speculative import SpeculativeEngine
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params


def build_engine(args) -> SpeculativeEngine:
    pns = tuple(int(p) for p in args.patch_nums.split("_"))
    vae_cfg = VQVAEConfig(patch_nums=pns)
    mk = dict(patch_nums=pns)
    draft_cfg = VARConfig(depth=args.depth_draft, **mk)
    target_cfg = VARConfig(depth=args.depth_target, **mk)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    key = jax.random.PRNGKey(args.seed)
    if args.ckpt_draft:
        import torch

        from sdvar_tpu.utils.torch_port import (
            var_params_from_torch,
            vqvae_params_from_torch,
        )

        draft_params = var_params_from_torch(
            draft_cfg, torch.load(args.ckpt_draft, map_location="cpu")
        )
        target_params = var_params_from_torch(
            target_cfg, torch.load(args.ckpt_target, map_location="cpu")
        )
        vae_params = vqvae_params_from_torch(
            vae_cfg, torch.load(args.ckpt_vae, map_location="cpu")
        )
    else:
        print("[bench-cli] no checkpoints given: using random weights "
              "(timings valid; quality/acceptance numbers not meaningful)")
        draft_params = init_var_params(
            draft_cfg, jax.random.fold_in(key, 1), dtype=dtype
        )
        target_params = init_var_params(
            target_cfg, jax.random.fold_in(key, 2), dtype=dtype
        )
        vae_params = {"quant": init_quantizer_params(
            vae_cfg, jax.random.fold_in(key, 3), eini=1.0
        )}
    if getattr(args, "quant", "none") != "none":
        from sdvar_tpu.ops.quantization import quantize_var_params

        mode = {"w8": "w8", "w8a8": "w8a8", "fp8": "fp8"}[args.quant]
        draft_params = quantize_var_params(draft_params, mode=mode)
        target_params = quantize_var_params(target_params, mode=mode)
        print(f"[bench-cli] quantized draft+target weights: {args.quant}")
    return SpeculativeEngine(
        vae_cfg, draft_cfg, target_cfg, vae_params, draft_params,
        target_params, dtype=dtype,
    )


def benchmark_config(args) -> SamplingConfig:
    # notebook benchmark config (sdvar_colab_test.py:88-129)
    return SamplingConfig(cfg=args.cfg, top_k=args.top_k, top_p=args.top_p)


def mode_gamma(eng: SpeculativeEngine, args):
    """γ sweep with wall-clock + acceptance telemetry."""
    samp = benchmark_config(args)
    labels = jnp.asarray(args.labels[: args.batch])
    key = jax.random.PRNGKey(args.seed)
    rows = []
    for gamma in (1, 2, 3):
        spec = SpeculativeConfig(gamma=gamma)
        eng.generate_speculative(labels, key, spec, samp)  # warmup/compile
        t0 = time.time()
        for i in range(args.iters):
            f_hat, stats = eng.generate_speculative(
                labels, jax.random.fold_in(key, i), spec, samp
            )
            jax.block_until_ready(f_hat)
        dt = (time.time() - t0) / args.iters
        rows.append({
            "gamma": gamma, "sec_per_batch": round(dt, 4),
            "images_per_sec": round(len(labels) / dt, 3),
            **stats.as_dict(),
        })
        print(json.dumps(rows[-1]))
    return rows


def mode_seq_vs_spec(eng: SpeculativeEngine, args):
    """Sequential target-only vs speculative; target-call accounting
    (sdvar_colab_test.py:267-331)."""
    samp = benchmark_config(args)
    labels = jnp.asarray(args.labels[: args.batch])
    key = jax.random.PRNGKey(args.seed)

    base = decode_all_scales(
        eng.target_cfg, eng.vae_cfg, eng.target_params, eng.quant_params,
        labels, key, samp, eng.dtype,
    )
    jax.block_until_ready(base)
    t0 = time.time()
    for i in range(args.iters):
        out = decode_all_scales(
            eng.target_cfg, eng.vae_cfg, eng.target_params, eng.quant_params,
            labels, jax.random.fold_in(key, i), samp, eng.dtype,
        )
        jax.block_until_ready(out)
    seq_dt = (time.time() - t0) / args.iters

    spec = SpeculativeConfig(gamma=args.gamma)
    eng.generate_speculative(labels, key, spec, samp)
    t0 = time.time()
    stats = None
    for i in range(args.iters):
        f_hat, stats = eng.generate_speculative(
            labels, jax.random.fold_in(key, i), spec, samp
        )
        jax.block_until_ready(f_hat)
    spec_dt = (time.time() - t0) / args.iters

    S = eng.num_scales
    row = {
        "sequential_sec": round(seq_dt, 4),
        "speculative_sec": round(spec_dt, 4),
        "speedup": round(seq_dt / spec_dt, 3),
        "target_calls": stats.target_calls,
        "target_calls_sequential": S,
        "theoretical_speedup": round(S / max(stats.target_calls, 1), 2),
        **stats.as_dict(),
    }
    print(json.dumps(row))
    return row


def mode_quality(eng: SpeculativeEngine, args):
    """Latent MSE + token agreement between speculative and target-only
    generation (sdvar_colab_test.py:338-398 used image MSE)."""
    samp = benchmark_config(args)
    labels = jnp.asarray(args.labels[: args.batch])
    key = jax.random.PRNGKey(args.seed)
    base = decode_all_scales(
        eng.target_cfg, eng.vae_cfg, eng.target_params, eng.quant_params,
        labels, key, samp, eng.dtype,
    )
    f_hat, stats = eng.generate_speculative(
        labels, key, SpeculativeConfig(gamma=args.gamma), samp
    )
    mse = float(jnp.mean((f_hat - base) ** 2))
    row = {
        "latent_mse_vs_target_only": round(mse, 6),
        "accept_rate": round(
            stats.accept_count / max(stats.accept_count + stats.reject_count, 1), 3
        ),
        **stats.as_dict(),
    }
    print(json.dumps(row))
    return row


def mode_quant(eng: SpeculativeEngine, args):
    """Quantization-quality probe: target-only decode under bf16 vs
    quantized weights (w8/w8a8) with the SAME seed — token agreement over
    all 680 sampled ids, latent MSE, and wall-clock for both. Build the
    engine WITHOUT --quant; this mode quantizes internally. With model-zoo
    checkpoints this is the cheap stand-in for the FID-delta gate
    (BASELINE.json: FID delta <= 0.1); with random weights only the
    mechanics are exercised."""
    from sdvar_tpu.ops.quantization import quantize_var_params

    samp = benchmark_config(args)
    labels = jnp.asarray(args.labels[: args.batch])
    key = jax.random.PRNGKey(args.seed)

    def run(params, kv_mode="bf16"):
        f_hat, ids = decode_all_scales(
            eng.target_cfg, eng.vae_cfg, params, eng.quant_params,
            labels, key, samp, eng.dtype, return_ids=True, kv_mode=kv_mode,
        )
        jax.block_until_ready((f_hat, ids))
        t0 = time.time()
        f_hat, ids = decode_all_scales(
            eng.target_cfg, eng.vae_cfg, params, eng.quant_params,
            labels, key, samp, eng.dtype, return_ids=True, kv_mode=kv_mode,
        )
        jax.block_until_ready((f_hat, ids))
        return f_hat, np.asarray(ids), time.time() - t0

    base_fhat, base_ids, base_dt = run(eng.target_params)
    rows = []
    for mode, kv_mode in (("w8", "bf16"), ("fp8", "bf16"),
                          ("w8a8", "bf16"), ("w8a8", "int8")):
        qp = quantize_var_params(eng.target_params, mode=mode)
        q_fhat, q_ids, q_dt = run(qp, kv_mode=kv_mode)
        agree = float((q_ids == base_ids).mean())
        # agreement per scale shows where quantization noise bites
        pns = eng.target_cfg.patch_nums
        off, per_scale = 0, []
        for pn in pns:
            per_scale.append(
                round(float((q_ids[:, off:off + pn * pn]
                             == base_ids[:, off:off + pn * pn]).mean()), 3))
            off += pn * pn
        rows.append({
            "quant": mode + ("+int8kv" if kv_mode == "int8" else ""),
            "token_agreement_vs_bf16": round(agree, 4),
            "per_scale_agreement": per_scale,
            "latent_mse_vs_bf16": round(
                float(jnp.mean((q_fhat - base_fhat) ** 2)), 6),
            "sec_bf16": round(base_dt, 4), "sec_quant": round(q_dt, 4),
            "speedup": round(base_dt / q_dt, 3),
        })
        print(json.dumps(rows[-1]))
    return rows


def mode_handoff(eng: SpeculativeEngine, args):
    """sd_mask 0..5 x entry_num ablation (models/var.py:777-824)."""
    samp = benchmark_config(args)
    labels = jnp.asarray(args.labels[: args.batch])
    key = jax.random.PRNGKey(args.seed)
    rows = []
    for sd_mask in range(6):
        f_hat, stats = eng.generate_handoff(
            labels, key, entry_num=args.entry_num, sd_mask=sd_mask, samp=samp
        )
        jax.block_until_ready(f_hat)
        t0 = time.time()
        f_hat, stats = eng.generate_handoff(
            labels, key, entry_num=args.entry_num, sd_mask=sd_mask, samp=samp
        )
        jax.block_until_ready(f_hat)
        rows.append({
            "sd_mask": sd_mask, "entry_num": args.entry_num,
            "sec": round(time.time() - t0, 4),
            "target_calls": stats.target_calls,
        })
        print(json.dumps(rows[-1]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["gamma", "seqspec", "quality",
                                       "handoff", "quant"], default="gamma")
    ap.add_argument("--depth-draft", type=int, default=16)
    ap.add_argument("--depth-target", type=int, default=30)
    ap.add_argument("--patch-nums", dest="patch_nums", type=str,
                    default="1_2_3_4_5_6_8_10_13_16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gamma", type=int, default=2)
    ap.add_argument("--entry-num", type=int, default=4)
    ap.add_argument("--cfg", type=float, default=3.0)       # notebook default
    ap.add_argument("--top-k", type=int, default=900)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--quant", choices=["none", "w8", "w8a8", "fp8"],
                default="none",
                    help="INT8 weight-only (w8) or weight+activation (w8a8) "
                         "quantization of both models")
    # notebook classes (sdvar_colab_test.py:88-129)
    ap.add_argument("--labels", type=int, nargs="+",
                    default=[980, 437, 22, 562, 980, 437, 22, 562])
    ap.add_argument("--ckpt-vae", type=str, default=None)
    ap.add_argument("--ckpt-draft", type=str, default=None)
    ap.add_argument("--ckpt-target", type=str, default=None)
    args = ap.parse_args()

    eng = build_engine(args)
    {"gamma": mode_gamma, "seqspec": mode_seq_vs_spec, "quant": mode_quant,
     "quality": mode_quality, "handoff": mode_handoff}[args.mode](eng, args)


if __name__ == "__main__":
    main()
