"""Subprocess worker for tests/test_multiprocess.py (NOT a test module).

Runs the REAL training entry point (train_loop.run_training) under
``jax.distributed`` with 2 processes x 4 virtual CPU devices each, on a
2x4 data x model mesh — the reference's production topology is torchrun
multi-process (reference: train.py:102, dist.py:20-49). This executes every
multi-process branch that is dead code in single-process tests:

  - ``parallel.distributed.initialize`` -> jax.distributed.initialize
    (distributed.py:26-43),
  - DistInfiniteBatchSampler per-rank contiguous slices (world_size=2),
  - ``mesh.shard_batch``'s make_array_from_process_local_data branch
    (mesh.py:117-119),
  - ``allreduce_host`` eval-stat reduction + ``allgather_host`` +
    ``barrier`` (distributed.py:75-104),
  - the collective orbax checkpoint save + sharded restore.

Writes a JSON report (per-iter losses + param digests) for the parent test
to compare against a single-process 8-device run on identical data.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path[:] = [p for p in sys.path if "axon_site" not in p]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# cross-process CPU collectives (the CPU stand-in for ICI/DCN transport)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sdvar_tpu.parallel import distributed as D  # noqa: E402

# must match test_multiprocess.py's reference run
from tests.mp_common import (  # noqa: E402
    GLOBAL_BS,
    MAX_ITERS,
    PNS,  # noqa: F401 (part of the shared contract)
    SEED,
    tiny_configs,
)


def digest_params(params) -> dict:
    """Order-stable scalar digests of every leaf; sums are computed on
    device (replicated outputs), so this works on non-addressable
    TP-sharded arrays."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        out[name] = float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    return out


def main() -> None:
    out_dir = sys.argv[1]
    D.initialize()  # SDVAR_NUM_PROCESSES / SDVAR_PROCESS_ID / SDVAR_COORDINATOR
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    rank = D.get_rank()
    assert D.get_world_size() == 2
    assert D.is_master() == (rank == 0)

    from sdvar_tpu.config import MeshConfig, TrainConfig
    from sdvar_tpu.train import checkpoint as ckpt
    from sdvar_tpu.train.train_loop import run_training
    from sdvar_tpu.train.trainer import TrainState

    vae_cfg, var_cfg = tiny_configs()
    tc = TrainConfig(depth=2, reso=48, global_batch_size=GLOBAL_BS, epochs=1,
                     label_smooth=0.0, saln_every=1)
    run_dir = os.path.join(out_dir, "run")
    state, history = run_training(
        tc, data_root=None, out_dir=run_dir, seed=SEED, max_iters=MAX_ITERS,
        batch_override=GLOBAL_BS, mesh_cfg=MeshConfig(data=2, model=4),
        var_cfg=var_cfg, vae_cfg=vae_cfg,
    )

    # collective orbax restore into the final state's shardings; every
    # process participates (checkpoint.py is multi-host collective)
    D.barrier()
    restored, meta = ckpt.auto_resume(run_dir, state)
    assert restored is not None and meta["step"] == MAX_ITERS, meta
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(TrainState(*restored)),
        jax.tree_util.tree_leaves_with_path(state),
    ):
        assert a.sharding == b.sharding, (pa, a.sharding, b.sharding)
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data), err_msg=str(pa))

    # host allgather smoke (reference dist.py:109-119)
    g = D.allgather_host(np.asarray([float(rank)], np.float64))
    assert g.shape == (2, 1) and float(g.sum()) == 1.0, g

    # variable-leading-dim allgather (reference allgather_diff_shape,
    # dist.py:122-146): rank r contributes r+1 rows
    vr = np.full((rank + 1, 2), float(rank), np.float32)
    parts = D.allgather_host_varlen(vr)
    assert [p.shape for p in parts] == [(1, 2), (2, 2)], parts
    for r, p in enumerate(parts):
        np.testing.assert_array_equal(p, np.full((r + 1, 2), float(r)))

    with open(os.path.join(out_dir, f"report_rank{rank}.json"), "w") as f:
        json.dump({
            "rank": rank,
            "history": history,
            "digests": digest_params(state.params),
        }, f)
    D.barrier()
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
