"""Train a REAL draft/target VAR pair on-chip and drive the speculative
engine through the organic partial-acceptance regime (round-4 VERDICT #1/#2).

The repo's speculative tests only ever saw the two degenerate operating
points (random weights ~= 0% match; force_accept_all == 100%). This tool
produces the regime the reference's contribution actually targets
(reference: models/var.py:1199-1222, PROJECT_STATUS_SUMMARY.md:30-37):
per-scale draft/target top-1 match rates strictly inside (0,1), varying by
scale, by training two small VARs over one shared (frozen, seed-fixed)
VQVAE on a structured learnable dataset (train/data.StructuredSynthImages).

Subcommands (state lives under --work, default /tmp/sdvar_pair):
  prep   write the PNG dataset (train+val) and pretokenize the train split
  train  --role target|draft: full run_training loop (bf16, pretokenized,
         LR schedule + eval_ep on the held-out split), history + final ckpt
  sweep  load both checkpoints, run generate_speculative across
         gamma x threshold (+ per-scale match profiles), print JSON rows
  drill  kill -9 a training subprocess mid-epoch, relaunch with
         auto_resume, assert bitwise continuation vs an uninterrupted run

Reference parity targets: acceptance rule var.py:1199-1222, dynamic-gamma
var.py:1352-1364, epoch loop train.py:171-250, resume utils/misc.py:344-357.
"""
from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")

# dataset geometry: 16 classes x 128 train (+16 val) images, 288px masters
# (FolderImageNet's 1.125x mid-reso for 256px crops)
NUM_CLASSES, PER_CLASS, PER_CLASS_VAL = 16, 128, 16
SEED = 0


def _dirs(work: str) -> dict:
    return {
        "train": os.path.join(work, "data", "train"),
        "val": os.path.join(work, "data", "val"),
        "tokens": os.path.join(work, "tokens"),
        "target": os.path.join(work, "target"),
        "draft": os.path.join(work, "draft"),
        "drill": os.path.join(work, "drill"),
    }


def _vae(seed: int = SEED):
    """EXACTLY build_everything's VQVAE construction (train_loop.py:65-67):
    same cfg, same key split — tokens, eval and the sweep engine must all
    see one tokenizer."""
    from sdvar_tpu.config import TrainConfig, VQVAEConfig
    from sdvar_tpu.models.vqvae import init_vqvae_params

    tc = TrainConfig(reso=256)
    cfg = VQVAEConfig(patch_nums=tc.patch_nums)
    k1, _ = jax.random.split(jax.random.PRNGKey(seed))
    return cfg, init_vqvae_params(cfg, k1)


def cmd_prep(args) -> None:
    from sdvar_tpu.train.data import write_structured_folder
    from sdvar_tpu.train.pretokenize import (
        build_token_datasets_for_passes,
        pretokenize_dataset,
    )

    d = _dirs(args.work)
    n_tr = write_structured_folder(d["train"], NUM_CLASSES, PER_CLASS,
                                   seed=SEED)
    n_va = write_structured_folder(d["val"], NUM_CLASSES, PER_CLASS_VAL,
                                   seed=SEED + 777)  # fresh draws: held out
    print(f"[prep] dataset: {n_tr} train / {n_va} val PNGs", flush=True)
    vae_cfg, vae_params = _vae()
    datasets = build_token_datasets_for_passes(
        d["train"], 256, args.passes, seed=SEED, hflip=True)
    m = pretokenize_dataset(vae_cfg, vae_params, datasets, d["tokens"],
                            batch=32)
    print(f"[prep] tokens: {m['num_samples']} x {m['passes']} passes "
          f"(L={m['L']})", flush=True)


def _train_cfg(role: str, args):
    from sdvar_tpu.config import TrainConfig

    depth = args.depth or {"target": 8, "draft": 4, "drill": 4}[role]
    epochs = args.epochs or {"target": 96, "draft": 64, "drill": 4}[role]
    return TrainConfig(
        depth=depth, reso=256, global_batch_size=args.bs, epochs=epochs,
        base_lr=args.base_lr, saln_every=args.saln_every
        or {"target": 12, "draft": 8, "drill": 1}[role],
    )


def cmd_train(args) -> None:
    import jax.numpy as jnp

    from sdvar_tpu.train import checkpoint as ckpt
    from sdvar_tpu.train.train_loop import run_training

    d = _dirs(args.work)
    role = args.role
    out = args.out or d[role]
    tc = _train_cfg(role, args)
    t0 = time.time()
    state, history = run_training(
        tc, data_root=d["train"], out_dir=out, seed=SEED,
        max_iters=args.max_iters, batch_override=args.bs,
        dtype=jnp.bfloat16, token_root=d["tokens"], val_root=d["val"],
    )
    dt = time.time() - t0
    # final checkpoint (run_training itself saves only at epoch boundaries)
    ckpt.save_checkpoint(out, int(state.step), state,
                         meta={"role": role, "depth": tc.depth,
                               "final": True})
    with open(os.path.join(out, "history.jsonl"), "w") as f:
        for h in history:
            f.write(json.dumps(h) + "\n")
    if history:
        n = len(history)
        loss0 = np.mean([h["loss"] for h in history[:20]])
        loss1 = np.mean([h["loss"] for h in history[-20:]])
        print(f"[train:{role}] d{tc.depth} {n} steps in {dt/60:.1f} min "
              f"({dt/max(n,1)*1e3:.0f} ms/step): loss {loss0:.3f} -> "
              f"{loss1:.3f}", flush=True)


def _load_role(work: str, role: str, depth: int):
    """Restore a trained VAR from the run dir's latest checkpoint."""
    from sdvar_tpu.config import TrainConfig, VARConfig
    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.train import checkpoint as ckpt
    from sdvar_tpu.train.trainer import TrainState, init_train_state

    tc = TrainConfig(reso=256)
    cfg = VARConfig(depth=depth, patch_nums=tc.patch_nums)
    _, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    template = init_train_state(init_var_params(cfg, k2))
    loaded, meta = ckpt.auto_resume(_dirs(work)[role], template)
    assert loaded is not None, f"no checkpoint for {role} in {work}"
    state = TrainState(*loaded)
    print(f"[load:{role}] d{depth} step {meta['step']}", flush=True)
    return cfg, state.params


def cmd_sweep(args) -> None:
    import jax.numpy as jnp

    from sdvar_tpu.config import SamplingConfig, SpeculativeConfig
    from sdvar_tpu.engine.decode import decode_all_scales
    from sdvar_tpu.engine.speculative import SpeculativeEngine

    vae_cfg, vae_params = _vae()
    t_cfg, t_params = _load_role(args.work, "target", args.target_depth)
    d_cfg, d_params = _load_role(args.work, "draft", args.draft_depth)
    eng = SpeculativeEngine(vae_cfg, d_cfg, t_cfg, vae_params,
                            d_params, t_params, dtype=jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(1)
    label = jnp.asarray(rng.integers(0, NUM_CLASSES, B), jnp.int32)
    samp = SamplingConfig(cfg=1.5, top_k=args.top_k, top_p=0.96)
    rows = []

    def sync(x):
        return float(jnp.sum(x))

    # target-only baseline decode (wall-clock reference for speedups)
    for i in range(3):
        t0 = time.time()
        f_hat = decode_all_scales(t_cfg, vae_cfg, t_params,
                                  vae_params["quant"], label,
                                  jax.random.PRNGKey(50 + i), samp,
                                  jnp.bfloat16)
        sync(f_hat)
        base_ms = (time.time() - t0) * 1e3
    print(f"[sweep] target-only decode: {base_ms:.1f} ms/batch B={B}",
          flush=True)

    # per-scale match profiles: gamma=1 windows visit scales in order
    for tag, thr, resample in (("draft-ctx", -1.0, False),
                               ("target-ctx", 2.0, True)):
        spec = SpeculativeConfig(gamma=1, match_threshold=thr,
                                 dynamic_gamma=False,
                                 force_accept_at_gamma1=not resample)
        _, st = eng.generate_speculative(label, jax.random.PRNGKey(7),
                                         spec, samp,
                                         resample_on_reject=resample)
        prof = [round(float(r), 4) for r in st.match_rates]
        print(f"[sweep] per-scale match ({tag}): {prof}", flush=True)
        rows.append({"kind": f"profile_{tag}", "match_rates": prof})

    for gamma in args.gammas:
        for thr in args.thresholds:
            spec = SpeculativeConfig(gamma=gamma, match_threshold=thr)
            st = None
            for i in range(args.iters):
                t0 = time.time()
                f_hat, st = eng.generate_speculative(
                    label, jax.random.PRNGKey(100 + i), spec, samp,
                    resample_on_reject=args.resample)
                sync(f_hat)
                ms = (time.time() - t0) * 1e3
            s = st.as_dict()
            row = {
                "kind": "sweep", "gamma": gamma, "threshold": thr,
                "resample": args.resample, "ms_per_batch": round(ms, 1),
                "vs_target_only": round(base_ms / ms, 3), **{
                    k: s[k] for k in ("draft_calls", "target_calls",
                                      "accept_count", "reject_count",
                                      "forced_accepts", "resampled_scales")
                },
                "mean_match": round(float(np.mean(s["match_rates"])), 4),
            }
            rows.append(row)
            print("[sweep] " + json.dumps(row), flush=True)
    out = os.path.join(args.work, "sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[sweep] wrote {out}", flush=True)


def cmd_drill(args) -> None:
    """Kill/resume equivalence on the REAL chip (round-4 VERDICT #2):
    control = uninterrupted run to 2.5 epochs; victim = same config
    SIGKILLed mid-epoch-2, relaunched, auto-resumed. The epoch-2-boundary
    checkpoints of both runs must match bitwise (deterministic sampler +
    fold_in(key, g_it) steps + orbax restore)."""
    import signal
    import subprocess

    d = _dirs(args.work)
    ipe = (NUM_CLASSES * PER_CLASS) // args.bs  # iters per epoch
    max_iters = ipe * 2 + ipe // 2

    def launch(out, max_it):
        cmd = [_sys.executable, os.path.abspath(__file__),
               "--work", args.work, "train", "--role", "drill",
               "--bs", str(args.bs), "--out", out]
        if max_it:
            cmd += ["--max-iters", str(max_it)]
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    ctrl, vict = os.path.join(d["drill"], "ctrl"), os.path.join(d["drill"], "vict")
    import shutil

    for dd in (ctrl, vict):  # idempotent: stale ckpts would skew auto_resume
        shutil.rmtree(dd, ignore_errors=True)
    p = launch(ctrl, max_iters)
    out_text, _ = p.communicate(timeout=1800)
    assert p.returncode == 0, out_text[-3000:]
    print(f"[drill] control run done ({max_iters} iters)", flush=True)

    # victim: kill by exact PID mid-epoch-2 (after the ep-1 checkpoint
    # lands), then relaunch and let auto_resume replay the tail
    p = launch(vict, None)
    killed = False
    t0 = time.time()
    while time.time() - t0 < 1800:
        line = p.stdout.readline()
        if not line:
            break
        print("  [victim] " + line.rstrip(), flush=True)
        # mid-epoch 2, rounded to the 10-iter console cadence
        trig = ipe + ipe // 2 - (ipe + ipe // 2) % 10
        if f"[it {trig}/" in line:
            os.kill(p.pid, signal.SIGKILL)
            killed = True
            break
    p.wait(timeout=60)
    assert killed, "victim never reached the kill point"
    print(f"[drill] SIGKILLed victim at it~{ipe + ipe//2} "
          f"(rc={p.returncode})", flush=True)
    p = launch(vict, max_iters)
    out_text, _ = p.communicate(timeout=1800)
    assert p.returncode == 0, out_text[-3000:]
    assert "[resume] from step" in out_text, out_text[-3000:]
    print("[drill] victim resumed and finished", flush=True)

    # compare the epoch-2-boundary checkpoints bitwise
    from sdvar_tpu.config import TrainConfig, VARConfig
    from sdvar_tpu.models.var import init_var_params
    from sdvar_tpu.train import checkpoint as ckpt
    from sdvar_tpu.train.trainer import init_train_state

    tc = TrainConfig(reso=256)
    cfg = VARConfig(depth=args.depth or 4, patch_nums=tc.patch_nums)
    _, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    template = init_train_state(init_var_params(cfg, k2))
    step = ipe * 2
    a, _ = ckpt.load_checkpoint(os.path.join(ctrl, f"ckpt-{step:08d}"),
                                template)
    b, _ = ckpt.load_checkpoint(os.path.join(vict, f"ckpt-{step:08d}"),
                                template)
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    bad = sum(not np.array_equal(np.asarray(x), np.asarray(y))
              for x, y in zip(la, lb))
    assert len(la) == len(lb) and bad == 0, f"{bad} mismatched leaves"
    print(f"[drill] PASS: resume continuation bitwise-equal at step {step} "
          f"({len(la)} leaves)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=str, default="/tmp/sdvar_pair")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prep")
    sp.add_argument("--passes", type=int, default=2)

    st = sub.add_parser("train")
    st.add_argument("--role", choices=("target", "draft", "drill"),
                    required=True)
    st.add_argument("--depth", type=int, default=0)
    st.add_argument("--epochs", type=int, default=0)
    st.add_argument("--bs", type=int, default=32)
    st.add_argument("--base-lr", type=float, default=1.6e-3)
    st.add_argument("--saln-every", type=int, default=0)
    st.add_argument("--max-iters", type=int, default=None)
    st.add_argument("--out", type=str, default=None)

    sw = sub.add_parser("sweep")
    sw.add_argument("--batch", type=int, default=16)
    sw.add_argument("--target-depth", type=int, default=8)
    sw.add_argument("--draft-depth", type=int, default=4)
    sw.add_argument("--gammas", type=int, nargs="+", default=[1, 2, 3, 4])
    sw.add_argument("--thresholds", type=float, nargs="+",
                    default=[0.3, 0.5, 0.7, 0.9])
    sw.add_argument("--top-k", type=int, default=900)
    sw.add_argument("--iters", type=int, default=3)
    sw.add_argument("--resample", action="store_true")

    dr = sub.add_parser("drill")
    dr.add_argument("--bs", type=int, default=32)
    dr.add_argument("--depth", type=int, default=0)

    args = ap.parse_args()
    {"prep": cmd_prep, "train": cmd_train, "sweep": cmd_sweep,
     "drill": cmd_drill}[args.cmd](args)


if __name__ == "__main__":
    main()
