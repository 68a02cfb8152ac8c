"""Adjudicate the d16 training-MFU gap with measurements (round-4 VERDICT
ask #6): d16 pre-tokenized B=32 trains at 36.7% MFU vs d30's 52.8%, and the
"width-bound" explanation was asserted, never demonstrated.

Method (the decode-plateau treatment, cf. tools/microbench_int8_matmul.py):
  1. measure the token-path d16 step steady-state (VAR fwd+bwd+adamw, no
     VQVAE — the pre-tokenized pipeline's compute)
  2. microbench every transformer GEMM shape of that step at its real row
     count (M = B*L) in all three passes (fwd / dgrad / wgrad)
  3. sum the at-measured-rate GEMM floor, attribute the residual
     (attention, adaLN/LN/elementwise, optimizer, dispatch)

Verdict: if the GEMM floor is ~the step time, d16's MFU is pinned by what
this compiler achieves on C=1024 shapes (a wall); a large residual is
harvestable. Run: python tools/adjudicate_mfu.py [--depth 16] [--bs 32]
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

PEAK_BF16 = 197e12  # v5e chip bf16 peak (BENCHMARKS.md MFU convention)
ITERS = 8  # in-jit loop count: amortizes the ~20 ms axon dispatch floor


def bench_loop(loop_fn, *args, reps=4):
    """Time ``loop_fn`` (a jitted ITERS-iteration fori_loop whose result
    depends on every iteration) with a device->host float() sync — under
    axon, block_until_ready can return before the program finishes."""
    float(loop_fn(*args))  # compile + warmup
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(loop_fn(*args))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from sdvar_tpu.config import VARConfig, VQVAEConfig
    from sdvar_tpu.models.quantizer import init_quantizer_params
    from sdvar_tpu.models.var import init_var_params, var_train_forward
    from sdvar_tpu.train.trainer import init_train_state, train_step

    cfg = VARConfig(depth=args.depth)
    vae_cfg = VQVAEConfig()
    w, V, d = cfg.embed_dim, cfg.vocab_size, args.depth
    B, L = args.bs, cfg.L
    M = B * L

    # -- 1. the real step (token path: pretokenized=True skips the VQVAE
    # encode; the quantizer embed in idx_to_var_input remains, as in the
    # real pipeline) --
    params = init_var_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    state = init_train_state(params)
    vae_params = {"quant": init_quantizer_params(vae_cfg,
                                                 jax.random.PRNGKey(3))}
    gt = jnp.zeros((B, L), jnp.int32)
    label = jnp.zeros((B,), jnp.int32)

    def step(state):
        # remat=True matches the measured 560 ms/36.7% MFU row
        # (BENCHMARKS.md pre-tokenized table; d16 B=32 needs it to fit)
        return train_step(cfg, vae_cfg, state, vae_params, gt, label,
                          jnp.asarray(1e-4), jnp.asarray(0.05),
                          jax.random.PRNGKey(1), dtype=jnp.bfloat16,
                          remat=True, pretokenized=True)

    # sync on the returned loss metric (a float() pull is the reliable
    # completion barrier under axon; 560 ms >> the dispatch floor)
    t_step = None
    s, m = step(state)
    float(m["loss"])
    for _ in range(args.iters):
        t0 = time.time()
        s, m = step(s)
        float(m["loss"])
        t = time.time() - t0
        t_step = t if t_step is None else min(t_step, t)
    gemm_fl = 3 * 2 * M * (12 * w * w * d + w * V + cfg.Cvae * w)
    attn_fl = 3 * 2 * 2 * B * L * L * w  # QK^T + PV, causal not credited
    mfu = (gemm_fl + attn_fl) / t_step / PEAK_BF16
    print(f"[mfu] d{d} B={B} token-path step: {t_step*1e3:.1f} ms "
          f"-> {mfu*100:.1f}% MFU ({(gemm_fl+attn_fl)/1e12:.1f} TF/step)",
          flush=True)

    # -- 2. per-GEMM microbench at real shapes ----------------------------
    key = jax.random.PRNGKey(2)
    shapes = [("qkv", w, 3 * w, d), ("proj", w, w, d),
              ("fc1", w, 4 * w, d), ("fc2", 4 * w, w, d),
              ("head", w, V, 1)]

    @jax.jit
    def floop(x, ww):
        def body(i, x):
            y = x @ ww
            return x + (jnp.mean(y) * 1e-9).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    @jax.jit
    def wloop(x, g):
        def body(i, x):
            y = jnp.einsum("mk,mn->kn", x, g,
                           preferred_element_type=jnp.float32)
            return x + (jnp.mean(y) * 1e-9).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    total_gemm_ms = 0.0
    rows = []
    for name, K, N, cnt in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        wm = jax.random.normal(key, (K, N), jnp.bfloat16)
        g = jax.random.normal(key, (M, N), jnp.bfloat16)
        wt = jax.random.normal(key, (N, K), jnp.bfloat16)
        fl = 2 * M * K * N
        t_f = bench_loop(floop, x, wm)
        t_d = bench_loop(floop, g, wt)
        t_w = bench_loop(wloop, x, g)
        # 2x t_f: the measured step runs remat (fwd is recomputed in bwd);
        # MFU above still uses the useful-FLOPs (3-pass) convention
        ms = (2 * t_f + t_d + t_w) * 1e3 * cnt
        total_gemm_ms += ms
        rows.append((name, K, N, cnt, t_f, t_d, t_w, fl))
        print(f"[mfu] {name:5s} {K:5d}x{N:5d} x{cnt:2d}: "
              f"fwd {fl/t_f/1e12:5.1f}T dgrad {fl/t_d/1e12:5.1f}T "
              f"wgrad {fl/t_w/1e12:5.1f}T -> {ms:6.1f} ms total", flush=True)

    # -- 3. attention + residual ------------------------------------------
    from sdvar_tpu.ops.attention import attention as attn_fn

    h = cfg.num_heads
    q = jax.random.normal(key, (B, L, h, cfg.head_dim), jnp.bfloat16)
    bias = jnp.zeros((L, L), jnp.bfloat16)

    @jax.jit
    def aloop(q):
        def body(i, q):
            y = attn_fn(q, q, q, bias, cfg.head_dim ** -0.5)
            return q + (jnp.mean(y) * 1e-9).astype(q.dtype)

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, q))

    t_attn = bench_loop(aloop, q)
    attn_ms = 3 * t_attn * 1e3 * d  # fwd+bwd ~ 3x fwd class
    resid = t_step * 1e3 - total_gemm_ms - attn_ms
    print(f"[mfu] GEMM floor {total_gemm_ms:.1f} ms "
          f"({total_gemm_ms/t_step/10:.1f}% of step) + attn ~{attn_ms:.1f} ms"
          f" -> residual {resid:.1f} ms "
          f"({resid/t_step/10:.1f}%: adaLN/LN/softmax-CE/optimizer/dispatch)",
          flush=True)
    gemm_rate = sum(r[7] * 3 for r in rows[:-1]) / (total_gemm_ms / 1e3) / 1e12
    print(f"[mfu] verdict: at the MEASURED per-shape GEMM rates "
          f"(~{gemm_rate:.0f} TFLOP/s avg) the step floor is "
          f"{(total_gemm_ms+attn_ms):.1f} ms = "
          f"{(total_gemm_ms+attn_ms)/t_step/10:.1f}% of the measured step; "
          f"the rest is harvestable iff the residual line is large.",
          flush=True)


if __name__ == "__main__":
    main()
