"""Training entry point (capability parity with reference train.py).

Builds data/models/optimizer, runs the epoch loop with eval-every-N and
checkpointing, supports auto-resume and a ``--smoke`` mode mirroring the
reference's local_debug fast path (train.py:140-162: two synthetic steps +
state round-trip) runnable on CPU without data.

Run:  python -m sdvar_tpu.train.train_loop --smoke
      python -m sdvar_tpu.train.train_loop --data /path/to/imagenet --depth 16
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import MeshConfig, TrainConfig, VARConfig, VQVAEConfig
from sdvar_tpu.models.var import count_params, init_var_params
from sdvar_tpu.models.vqvae import init_vqvae_params
from sdvar_tpu.parallel import distributed as D
from sdvar_tpu.parallel.mesh import (
    create_mesh,
    replicated_specs,
    shard_batch,
    shard_tree,
    var_param_specs,
)
from sdvar_tpu.train import checkpoint as ckpt
from sdvar_tpu.train.data import (
    DistInfiniteBatchSampler,
    EvalDistributedSampler,
    batch_arrays,
    build_dataset,
)
from sdvar_tpu.train.schedule import lr_wd_annealing
from sdvar_tpu.train.trainer import (
    TrainState,
    eval_step,
    init_train_state,
    train_step,
)
from sdvar_tpu.utils.logging import JsonlLogger, MetricLogger, TensorboardSink


def build_everything(tc: TrainConfig, seed: int = 0, mesh=None,
                     var_cfg: Optional[VARConfig] = None,
                     vae_cfg: Optional[VQVAEConfig] = None):
    """Init configs + params; when ``mesh`` is given, place VAR params per
    the tensor-parallel specs BEFORE optimizer init so Adam moments inherit
    the same shardings (reference DDP wrap point: train.py:102)."""
    if vae_cfg is None:
        vae_cfg = VQVAEConfig(patch_nums=tc.patch_nums)
    if var_cfg is None:
        var_cfg = VARConfig(
            depth=tc.depth, patch_nums=tc.patch_nums,
            shared_aln=tc.shared_aln, attn_l2_norm=tc.attn_l2_norm,
        )
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    vae_params = init_vqvae_params(vae_cfg, k1)
    var_params = init_var_params(var_cfg, k2)
    if mesh is not None:
        var_params = shard_tree(var_params, var_param_specs(var_cfg), mesh)
        vae_params = shard_tree(vae_params, replicated_specs(vae_params),
                                mesh)
    state = init_train_state(var_params, clip=tc.grad_clip,
                             optimizer=tc.optimizer)
    return vae_cfg, var_cfg, vae_params, state


def run_training(
    tc: TrainConfig,
    data_root: Optional[str] = None,
    out_dir: str = "local_output",
    seed: int = 0,
    max_iters: Optional[int] = None,
    batch_override: Optional[int] = None,
    dtype=jnp.float32,
    mesh_cfg: Optional[MeshConfig] = None,
    var_cfg: Optional[VARConfig] = None,
    vae_cfg: Optional[VQVAEConfig] = None,
    token_root: Optional[str] = None,
    val_root: Optional[str] = None,
):
    """Epoch loop over a data×model device mesh.

    ``mesh_cfg=None`` runs on the first local device (reference NullDDP,
    train.py:320-327); otherwise the batch is sharded over "data" and the
    VAR weights tensor-parallel over "model" (reference DDP: train.py:102,
    per-rank batch split: utils/arg_util.py:255-257). Multi-host: call
    ``parallel.distributed.initialize`` first; each process feeds its own
    contiguous slice of the global batch.
    """
    world, rank = D.get_world_size(), D.get_rank()
    mesh = create_mesh(mesh_cfg) if mesh_cfg is not None else None
    if mesh is not None:
        # Pallas kernels must be shard_map-wrapped under a >1-device mesh
        # (Mosaic is not GSPMD-partitionable — ops/partition docstring)
        from sdvar_tpu.ops.partition import set_tp_mesh

        set_tp_mesh(mesh)
    vae_cfg, var_cfg, vae_params, state = build_everything(
        tc, seed, mesh=mesh, var_cfg=var_cfg, vae_cfg=vae_cfg)
    if D.is_master():
        print(f"[init] VAR params: {count_params(state.params)/1e6:.2f}M"
              + (f" mesh={dict(mesh.shape)}" if mesh is not None else "")
              + (f" procs={world}" if world > 1 else ""))

    bs = batch_override or tc.global_batch_size
    assert bs % world == 0, (bs, world)
    if mesh is not None:
        assert bs % mesh.shape["data"] == 0, (bs, mesh.shape)
    pretokenized = token_root is not None
    if pretokenized:
        # pre-tokenized pipeline (tools/pretokenize.py): the per-step VQVAE
        # encode — half the d16 step time — is paid once, offline
        from sdvar_tpu.train.pretokenize import TokenDataset

        train_set = TokenDataset(token_root)
        if D.is_master():
            print(f"[data] token dataset: {len(train_set)} samples x "
                  f"{train_set.passes} passes (L={train_set.L})")
    else:
        train_set = build_dataset(data_root, reso=tc.reso, train=True)
    # held-out eval split: its own folder when given (train/pair drills),
    # else center-crops of the train root (reference uses the val split,
    # train.py:120; eval cadence train.py:208-231)
    val_set = build_dataset(val_root if val_root is not None else data_root,
                            reso=tc.reso, train=False, synthetic_len=64)

    # native C++ decode/augment pipeline when training off a real folder
    # (csrc/dataloader.cpp); synthetic data stays on the Python path
    native = None
    if hasattr(train_set, "samples"):
        try:
            from sdvar_tpu.train.native_loader import (
                NativeImageLoader,
                native_available,
            )

            if native_available():
                paths = [p for p, _ in train_set.samples]
                labels = [l for _, l in train_set.samples]
                native = NativeImageLoader(
                    paths, labels, reso=tc.reso, train=True, seed=seed,
                    num_threads=min(8, os.cpu_count() or 4),
                )
                print(f"[data] native C++ loader over {len(paths)} files")
        except Exception as e:
            print(f"[data] native loader unavailable ({e}); using Python path")

    # per-process contiguous slice of the global batch (reference
    # utils/data_sampler.py:96-100; world/rank = JAX process count/index)
    sampler = DistInfiniteBatchSampler(
        len(train_set), bs, world_size=world, rank=rank, seed=seed,
    )
    iters_per_ep = sampler.iters_per_ep
    max_it = tc.epochs * iters_per_ep
    wp_it = tc.warmup_epochs() * iters_per_ep

    os.makedirs(out_dir, exist_ok=True)
    jlog = JsonlLogger(os.path.join(out_dir, "log.txt"))
    tb = TensorboardSink(os.path.join(out_dir, "tb"))
    mlog = MetricLogger()

    # auto-resume (reference: utils/misc.py:344-357)
    resumed, meta = ckpt.auto_resume(out_dir, state)
    if resumed is not None:
        state = TrainState(*resumed)
        print(f"[resume] from step {meta['step']}")
    g_it = int(meta.get("step", 0))
    sampler.epoch = g_it // iters_per_ep
    sampler.start_it = g_it % iters_per_ep

    key = jax.random.PRNGKey(seed + 1)
    it_stream = iter(sampler)
    t0 = time.time()
    S = len(var_cfg.patch_nums)
    prog_wp_it = max(tc.pgwp_epochs() * iters_per_ep, 1)
    prog_it, last_prog_si, first_prog = 0, -1, True
    # history holds floats; pending holds device scalars awaiting the next
    # host sync (10-iter console cadence), so no per-iter sync stalls async
    # dispatch and no long run pins thousands of tiny device buffers.
    history, pending = [], []

    def _drain_pending():
        history.extend(
            {k: (v if isinstance(v, (int, float)) else float(v))
             for k, v in h.items()}
            for h in pending
        )
        pending.clear()

    while g_it < max_it:
        if max_iters is not None and g_it >= max_iters:
            break
        if pretokenized:
            # rotate the stored augmentation pass with the epoch
            train_set.set_epoch(g_it // iters_per_ep)
        idxs = next(it_stream)
        if native is not None:
            native.enqueue(idxs)
            img, label, _ = native.next_batch(len(idxs))
        else:
            img, label = batch_arrays(train_set, idxs)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            img = shard_batch(mesh, np.asarray(img), P("data"))
            label = shard_batch(mesh, np.asarray(label), P("data"))
        lr, wd = lr_wd_annealing(
            tc.lr_schedule, tc.peak_lr(), tc.weight_decay,
            tc.weight_decay_end, g_it, wp_it, max_it, wpe=0.01,
        )
        # progressive schedule + per-stage warmup (reference:
        # train.py:286-301, trainer.py:90-99)
        prog_si = tc.prog_si_at(g_it, wp_it, max_it, S)
        if last_prog_si != prog_si:
            if last_prog_si != -1:
                first_prog = False
            last_prog_si, prog_it = prog_si, 0
        prog_it += 1
        prog_wp = max(min(prog_it / prog_wp_it, 1), 0.01)
        if first_prog:
            prog_wp = 1.0
        if prog_si == S - 1:
            prog_si = -1
        state, metrics = train_step(
            var_cfg, vae_cfg, state, vae_params,
            jnp.asarray(img), jnp.asarray(label),
            jnp.asarray(lr, jnp.float32), jnp.asarray(wd, jnp.float32),
            jax.random.fold_in(key, g_it),
            clip=tc.grad_clip, label_smooth=tc.label_smooth,
            grad_accum=tc.grad_accum, dtype=dtype,
            prog_si=prog_si, prog_wp=jnp.asarray(prog_wp, jnp.float32),
            remat=tc.remat, tokenize_bf16=tc.tokenize_bf16,
            optimizer=tc.optimizer, pretokenized=pretokenized,
        )
        g_it += 1
        if tc.dbg_nan:
            # anomaly mode (reference train.py:173-174): sync every step;
            # on a bad loss, report exactly which param leaves went bad.
            # For op-level localization re-run the repro under
            # utils.debug.checked_grad_probe or enable_debug_nans().
            from sdvar_tpu.utils import debug as dbg

            if not np.isfinite(float(metrics["loss"])):
                report = dbg.nan_report(state.params, "params")
                raise FloatingPointError(
                    f"[dbg_nan] non-finite loss at it {g_it} "
                    f"(loss={float(metrics['loss'])}); bad param leaves:\n"
                    + ("\n".join(report[:20]) or "  (params clean - "
                       "transient activation NaN; use checked_grad_probe)")
                )
        # record as DEVICE scalars (no per-iter host sync — a float() here
        # would stall async dispatch every step); drained to floats at the
        # 10-iter console cadence below, where the host sync happens anyway,
        # so at most 10 iterations of tiny device buffers are ever pinned.
        pending.append(dict(metrics, it=g_it))
        if g_it % 10 == 0 or g_it == 1:
            m = {k: float(v) for k, v in metrics.items()}
            _drain_pending()
            mlog.update(**{k: m[k] for k in ("Lm", "Lt", "Accm", "Acct")})
            if D.is_master():
                print(f"[it {g_it}/{max_it}] loss={m['loss']:.4f} "
                      f"Lm={m['Lm']:.4f} Accm={m['Accm']:.2f} "
                      f"gnorm={m['grad_norm']:.3f} lr={m['lr']:.2e}")
                tb.update("AR_iter_loss", g_it, force=True, **{
                    k: m[k] for k in ("Lm", "Lt", "Accm", "Acct", "grad_norm",
                                      "z_voc_usage")
                })
        ep = g_it // iters_per_ep
        if g_it % iters_per_ep == 0:
            # eval + ckpt every `saln_every` epochs (train.py:208-231);
            # each process evals its contiguous shard, stats are summed
            # host-side (reference eval sharding: utils/data_sampler.py:6-17
            # + all-reduce trainer.py:79-83)
            if ep % tc.saln_every == 0:
                stats = {"L_mean": 0.0, "L_tail": 0.0, "acc_mean": 0.0,
                         "acc_tail": 0.0, "tot": 0.0}
                shard = list(EvalDistributedSampler(
                    min(len(val_set), 64), world, rank))
                for i0 in range(0, len(shard), 16):
                    img, label = batch_arrays(val_set, shard[i0:i0 + 16])
                    out = eval_step(var_cfg, vae_cfg, state.params, vae_params,
                                    jnp.asarray(img), jnp.asarray(label),
                                    dtype=dtype)
                    for k in stats:
                        stats[k] += float(out[k])
                red = D.allreduce_host(np.asarray(
                    [stats[k] for k in sorted(stats)], np.float64))
                stats = dict(zip(sorted(stats), red.tolist()))
                tot = max(stats.pop("tot"), 1.0)
                stats = {k: v / tot for k, v in stats.items()}
                if D.is_master():
                    print(f"[eval ep{ep}] {stats}")
                    jlog.write(epoch=ep, it=g_it, **stats)
                ckpt.save_checkpoint(out_dir, g_it, state,
                                     meta={"epoch": ep,
                                           "config": tc.__dict__ | {}})
    dt = time.time() - t0
    if D.is_master():
        print(f"[done] {g_it} iters in {dt:.1f}s")
    tb.close()
    _drain_pending()
    return state, history


def smoke_test() -> bool:
    """Reference local_debug equivalent (train.py:140-162): two synthetic
    steps on a tiny model + checkpoint round-trip."""
    tc = TrainConfig(depth=2, reso=256, global_batch_size=4, epochs=1,
                     label_smooth=0.0)
    patch_nums = (1, 2, 3)
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32,
                          patch_nums=patch_nums)
    var_cfg = VARConfig(depth=2, patch_nums=patch_nums, vocab_size=64,
                        Cvae=8, head_dim=32, num_classes=10)
    key = jax.random.PRNGKey(0)
    vae_params = init_vqvae_params(vae_cfg, key)
    state = init_train_state(init_var_params(var_cfg, key))

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 3, 48, 48)).astype(np.float32)
    label = np.array([1, 2], dtype=np.int32)
    losses = []
    for i in range(2):
        state, metrics = train_step(
            var_cfg, vae_cfg, state, vae_params,
            jnp.asarray(img), jnp.asarray(label),
            jnp.asarray(1e-4), jnp.asarray(0.05), jax.random.PRNGKey(i),
            label_smooth=0.0, dtype=jnp.float32,
        )
        losses.append(float(metrics["loss"]))
    # state round-trip (train.py:150-162)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ckpt.save_checkpoint(d, int(state.step), state)
        loaded, meta = ckpt.auto_resume(d, state)
        assert loaded is not None and meta["step"] == int(state.step)
        flat_a = jax.tree_util.tree_leaves(state)
        flat_b = jax.tree_util.tree_leaves(TrainState(*loaded))
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"[smoke] losses={losses} OK")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--val-data", type=str, default=None,
                    help="held-out eval folder (defaults to --data)")
    ap.add_argument("--tokens", type=str, default=None,
                    help="pre-tokenized dataset dir (tools/pretokenize.py); "
                         "skips the per-step VQVAE encode")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--ep", type=int, default=1)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--out", type=str, default="local_output")
    ap.add_argument("--pg", type=float, default=0.0,
                    help="progressive training fraction (reference args.pg)")
    ap.add_argument("--pg0", type=int, default=4)
    ap.add_argument("--dbg-nan", action="store_true",
                    help="NaN anomaly mode (reference arg_util.py:137)")
    ap.add_argument("--mesh-data", type=int, default=0,
                    help="data-parallel mesh axis; 0 = single device")
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel mesh axis")
    args = ap.parse_args()
    if args.smoke:
        smoke_test()
        return
    D.initialize()  # multi-host bring-up; no-op single-process
    # console triad (reference utils/misc.py:54-112): tee stdout/stderr to
    # files, master-gated timestamped print with caller file:line
    from sdvar_tpu.utils.logging import patch_print, tee_streams

    tee_streams(args.out)
    patch_print()
    mesh_cfg = (MeshConfig(data=args.mesh_data, model=args.mesh_model)
                if args.mesh_data > 0 else None)
    tc = TrainConfig(depth=args.depth, global_batch_size=args.bs,
                     epochs=args.ep, pg=args.pg, pg0=args.pg0,
                     dbg_nan=args.dbg_nan)
    run_training(tc, data_root=args.data, out_dir=args.out,
                 max_iters=args.max_iters, batch_override=args.bs,
                 mesh_cfg=mesh_cfg, token_root=args.tokens,
                 val_root=args.val_data)


if __name__ == "__main__":
    main()
