"""Training-step benchmark on the local accelerator (VERDICT round-2 #1).

Measures the REAL train_step — VQVAE tokenize -> teacher-forcing forward ->
backward -> clip -> AdamW — on synthetic image batches (the reference's
training hot loop: train.py:253-317, trainer.py:86-160). Reports ms/step,
imgs/s and transformer MFU (convention: 6 * N_var * B * L FLOPs per step —
fwd+bwd matmul flops of the VAR transformer only; the VQVAE tokenize and
AdamW update are included in the TIME but not the FLOP count, so reported
MFU is conservative).

Usage:
  python tools/bench_train.py step  [depth] [B] [iters] [flags...]
  python tools/bench_train.py accum [depth] [B_global]
  python tools/bench_train.py loader [n_images]
  flags: remat, bf16params, sgd, reso512, ac=N
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip


def log(*a):
    print(*a, flush=True)


def mem_stats(tag: str):
    try:
        st = jax.local_devices()[0].memory_stats()
        if st:
            log(f"[mem:{tag}] peak={st.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
                f"in_use={st.get('bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception:
        pass


def bench_step(depth: int, B: int, iters: int = 5, remat: bool = False,
               bf16_params: bool = False, sgd: bool = False,
               reso: int = 256, grad_accum: int = 1, shared_aln: bool = False,
               tokenize_bf16: bool = False, optimizer: str = "adamw",
               pretokenized: bool = False):
    from sdvar_tpu.config import TrainConfig, VARConfig, VQVAEConfig
    from sdvar_tpu.models.var import count_params, init_var_params
    from sdvar_tpu.models.vqvae import init_vqvae_params
    from sdvar_tpu.train import trainer as T

    tc = TrainConfig(depth=depth, reso=reso)
    var_cfg = VARConfig(depth=depth, patch_nums=tc.patch_nums,
                        shared_aln=shared_aln)
    vae_cfg = VQVAEConfig(patch_nums=tc.patch_nums)
    pdtype = jnp.bfloat16 if bf16_params else jnp.float32
    t0 = time.time()
    params = init_var_params(var_cfg, jax.random.PRNGKey(0), dtype=pdtype)
    jax.block_until_ready(params)
    vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(1))
    N = count_params(params)
    log(f"[train-bench] d{depth} reso={reso} B={B} ac={grad_accum} "
        f"params={N/1e6:.0f}M ({'bf16' if bf16_params else 'f32'}) "
        f"remat={remat} opt={'sgd' if sgd else optimizer} "
        f"(init {time.time()-t0:.0f}s)")

    if sgd:
        # memory-probe mode: no Adam moments (documents the optimizer-state
        # wall separately from the activation/backward wall)
        import optax

        from sdvar_tpu.train.trainer import TrainState

        tx = optax.sgd(1e-4)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))

        import functools

        @functools.partial(jax.jit,
                           static_argnames=("var_cfg", "vae_cfg", "remat"),
                           donate_argnames=("state",))
        def sgd_step(var_cfg, vae_cfg, state, vae_params, img, label, key,
                     remat=False):
            def fwd(p):
                from sdvar_tpu.models import quantizer as Q
                from sdvar_tpu.models import vqvae as VQ

                gt_idx = VQ.img_to_idxBl(vae_cfg, vae_params, img)
                gt_idx = [jax.lax.stop_gradient(i) for i in gt_idx]
                gt_BL = jnp.concatenate(gt_idx, axis=1)
                x_in = jax.lax.stop_gradient(
                    Q.idx_to_var_input(vae_cfg, vae_params["quant"], gt_idx))
                loss, metrics = T.loss_and_metrics(
                    var_cfg, p, label, x_in, gt_BL, key, 0.0,
                    dtype=jnp.bfloat16, remat=remat)
                return loss

            loss, grads = jax.value_and_grad(fwd)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state)
            import optax as ox

            params = ox.apply_updates(state.params, updates)
            return T.TrainState(params, opt_state, state.step + 1), loss

        def run(i):
            nonlocal state
            state, loss = sgd_step(var_cfg, vae_cfg, state, vae_params,
                                   img, label, jax.random.PRNGKey(i),
                                   remat=remat)
            return float(loss)
    else:
        state = T.init_train_state(params, clip=tc.grad_clip,
                                   optimizer=optimizer)

        def run(i):
            nonlocal state
            state, metrics = T.train_step(
                var_cfg, vae_cfg, state, vae_params, img, label,
                jnp.asarray(1e-4, jnp.float32), jnp.asarray(0.05, jnp.float32),
                jax.random.PRNGKey(i), clip=tc.grad_clip, label_smooth=0.1,
                grad_accum=grad_accum, dtype=jnp.bfloat16, remat=remat,
                tokenize_bf16=tokenize_bf16, optimizer=optimizer,
                pretokenized=pretokenized)
            return float(metrics["loss"])

    rng = np.random.default_rng(0)
    if pretokenized:
        # pre-tokenized pipeline (tools/pretokenize.py): the step consumes
        # stored token ids; token VALUES don't affect throughput
        img = jnp.asarray(
            rng.integers(0, var_cfg.vocab_size, (B, var_cfg.L)), jnp.int32)
    else:
        img = jnp.asarray(rng.uniform(-1, 1, (B, 3, reso, reso)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)

    t0 = time.time()
    loss = run(0)
    log(f"[train-bench] compile+first step {time.time()-t0:.1f}s "
        f"loss={loss:.4f}")
    mem_stats("first-step")
    times = []
    for i in range(1, iters + 1):
        t0 = time.time()
        loss = run(i)  # float() sync inside
        times.append(time.time() - t0)
    best = min(times)
    L = var_cfg.L
    flops = 6.0 * N * B * L
    mfu = flops / best / V5E_BF16_PEAK
    log(f"[train-bench] d{depth} B={B}: {best*1e3:.0f} ms/step, "
        f"{B/best:.2f} imgs/s, MFU~{mfu*100:.1f}% "
        f"(times={['%.2f' % t for t in times]}, loss={loss:.4f})")
    mem_stats("steady")
    return best, mfu


def bench_loader(n: int = 512):
    """Native C++ JPEG loader vs the Python/PIL path, identical work."""
    import tempfile

    from PIL import Image

    from sdvar_tpu.train.data import FolderImageNet, batch_arrays

    root = tempfile.mkdtemp(prefix="sdvar_loader_bench_")
    rng = np.random.default_rng(0)
    for c in range(4):
        d = os.path.join(root, f"class{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(n // 4):
            arr = rng.integers(0, 255, (320, 320, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:04d}.jpg"),
                                      quality=90)
    ds = FolderImageNet(root, reso=256, train=True)
    idxs = list(range(len(ds)))

    t0 = time.time()
    for i0 in range(0, n, 64):
        batch_arrays(ds, idxs[i0:i0 + 64])
    t_py = time.time() - t0
    log(f"[loader] python/PIL: {n} imgs in {t_py:.2f}s = {n/t_py:.1f} img/s")

    from sdvar_tpu.train.native_loader import NativeImageLoader, native_available

    if not native_available():
        log("[loader] native loader unavailable")
        return
    paths = [p for p, _ in ds.samples]
    labels = [l for _, l in ds.samples]
    nl = NativeImageLoader(paths, labels, reso=256, train=True, seed=0,
                           num_threads=min(8, os.cpu_count() or 4))
    # warmup one batch
    nl.enqueue(idxs[:64]); nl.next_batch(64)
    t0 = time.time()
    for i0 in range(0, n, 64):
        nl.enqueue(idxs[i0:i0 + 64])
        nl.next_batch(64)
    t_nat = time.time() - t0
    log(f"[loader] native C++: {n} imgs in {t_nat:.2f}s = {n/t_nat:.1f} img/s "
        f"({t_py/t_nat:.1f}x python)")


def bench_tokenize(B: int = 32, iters: int = 5, reso: int = 256,
                   bf16: bool = False, nhwc: bool = False):
    """Isolate the frozen-VQVAE tokenize (img_to_idxBl + idx_to_var_input)
    that runs inside every train step."""
    import functools

    from sdvar_tpu.config import TrainConfig, VQVAEConfig
    from sdvar_tpu.models import quantizer as Q
    from sdvar_tpu.models import vqvae as VQ
    from sdvar_tpu.models.vqvae import init_vqvae_params

    tc = TrainConfig(reso=reso)
    vae_cfg = VQVAEConfig(patch_nums=tc.patch_nums)
    vae_params = init_vqvae_params(vae_cfg, jax.random.PRNGKey(1))
    if nhwc:
        encode = VQ.img_to_idxBl_nhwc  # channels-last bf16 encoder
    else:
        encode = VQ.img_to_idxBl_bf16 if bf16 else VQ.img_to_idxBl
    log(f"[tokenize] encoder: "
        f"{'nhwc-bf16' if nhwc else ('bf16' if bf16 else 'f32-HIGHEST')}")

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def tok(cfg, p, img):
        gt_idx = encode(cfg, p, img)
        x_in = Q.idx_to_var_input(cfg, p["quant"], gt_idx)
        return jnp.concatenate(gt_idx, axis=1), x_in

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (B, 3, reso, reso)), jnp.float32)
    t0 = time.time()
    gt, x_in = tok(vae_cfg, vae_params, img)
    s = float(jnp.sum(gt) + jnp.sum(x_in))
    log(f"[tokenize] compile+first {time.time()-t0:.1f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        gt, x_in = tok(vae_cfg, vae_params, img)
        s = float(jnp.sum(gt) + jnp.sum(x_in))  # noqa: F841 sync
        times.append(time.time() - t0)
    log(f"[tokenize] B={B} reso={reso}: {min(times)*1e3:.0f} ms "
        f"({B/min(times):.1f} imgs/s) times={['%.3f' % t for t in times]}")


def bench_varonly(depth: int, B: int, iters: int = 5, remat: bool = False,
                  reso: int = 256):
    """VAR fwd+bwd+AdamW on pre-tokenized inputs — the transformer-only
    step time (subtracting this from the full step isolates tokenize)."""
    import functools

    from sdvar_tpu.config import TrainConfig, VARConfig
    from sdvar_tpu.models.var import count_params, init_var_params
    from sdvar_tpu.train import trainer as T

    tc = TrainConfig(depth=depth, reso=reso)
    var_cfg = VARConfig(depth=depth, patch_nums=tc.patch_nums)
    params = init_var_params(var_cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    N = count_params(params)
    state = T.init_train_state(params, clip=2.0)
    tx = T.make_optimizer(2.0)
    mask = None

    @functools.partial(jax.jit, static_argnames=("var_cfg", "remat"),
                       donate_argnames=("state",))
    def step(var_cfg, state, label, x_in, gt_BL, key, lr, wd, remat=False):
        mask = T.decay_mask(state.params)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: T.loss_and_metrics(var_cfg, p, label, x_in, gt_BL,
                                         key, 0.1, dtype=jnp.bfloat16,
                                         remat=remat),
            has_aux=True)(state.params)
        import optax

        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u, p, m: -(lr) * (u + wd * p * m),
                               updates, state.params, mask)
        params2 = optax.apply_updates(state.params, updates)
        return T.TrainState(params2, opt_state, state.step + 1), loss, gnorm

    rng = np.random.default_rng(0)
    L = var_cfg.L
    x_in = jnp.asarray(rng.standard_normal((B, L - 1, var_cfg.Cvae)),
                       jnp.float32)
    gt = jnp.asarray(rng.integers(0, var_cfg.vocab_size, (B, L)), jnp.int32)
    label = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    t0 = time.time()
    state, loss, gnorm = step(var_cfg, state, label, x_in, gt,
                              jax.random.PRNGKey(0),
                              jnp.asarray(1e-4), jnp.asarray(0.05),
                              remat=remat)
    _ = float(loss)
    log(f"[var-only] compile+first {time.time()-t0:.1f}s")
    times = []
    for i in range(iters):
        t0 = time.time()
        state, loss, gnorm = step(var_cfg, state, label, x_in, gt,
                                  jax.random.PRNGKey(i),
                                  jnp.asarray(1e-4), jnp.asarray(0.05),
                                  remat=remat)
        _ = float(loss)
        times.append(time.time() - t0)
    best = min(times)
    mfu = 6.0 * N * B * L / best / V5E_BF16_PEAK
    log(f"[var-only] d{depth} B={B} remat={remat}: {best*1e3:.0f} ms/step, "
        f"{B/best:.2f} imgs/s, transformer MFU~{mfu*100:.1f}% "
        f"times={['%.2f' % t for t in times]}")


import os  # noqa: E402  (used by bench_loader)

if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    if mode == "loader":
        bench_loader(int(sys.argv[2]) if len(sys.argv) > 2 else 512)
    elif mode == "tokenize":
        bench_tokenize(int(sys.argv[2]) if len(sys.argv) > 2 else 32,
                       bf16="bf16" in sys.argv[3:],
                       nhwc="nhwc" in sys.argv[3:])
    elif mode == "varonly":
        depth = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        B = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        bench_varonly(depth, B, remat="remat" in sys.argv[4:])
    elif mode == "accum":
        depth = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        Bg = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        for ac in (1, 2, 4):
            bench_step(depth, Bg, iters=4, grad_accum=ac, remat=True)
    else:
        depth = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        B = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
        flags = sys.argv[5:]
        bench_step(
            depth, B, iters=iters,
            remat="remat" in flags,
            bf16_params="bf16params" in flags,
            sgd="sgd" in flags,
            reso=512 if "reso512" in flags else 256,
            shared_aln="reso512" in flags,  # d36-s recipe uses shared AdaLN
            tokenize_bf16="tok16" in flags,
            optimizer="adafactor" if "adafactor" in flags else "adamw",
            pretokenized="tokens" in flags,
        )
