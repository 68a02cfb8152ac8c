"""Multi-host bring-up + host-side collective helpers.

Capability parity with the reference's ``dist.py`` surface (initialize,
rank/world predicates, master-gated decorators, barrier, simple collectives —
reference: dist.py:20-211), re-expressed for JAX multi-process:

  - ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator from
    env or args), the analogue of NCCL process-group init (dist.py:20-49).
    On a single host it is a no-op, matching the reference's "not
    initialized -> everything no-ops" behavior (dist.py:97-119).
  - device collectives live INSIDE jitted programs (psum/all_gather inserted
    by the compiler under pjit); the helpers here are for host-side control
    values (metric reduction, barriers around checkpoint IO).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host init. No-op when single-process (reference dist.py:22-28
    falls back silently)."""
    num = num_processes if num_processes is not None else int(
        os.environ.get("SDVAR_NUM_PROCESSES", "1")
    )
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("SDVAR_COORDINATOR", "localhost:1234"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("SDVAR_PROCESS_ID", "0")),
    )


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def is_local_master() -> bool:
    # one process per host in the JAX runtime model
    return True


def master_only(fn):
    """Run only on process 0 (reference dist.py:171-182)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if is_master():
            return fn(*a, **kw)
        return None

    return wrapper


def barrier() -> None:
    """Cross-process sync (reference dist.py:92-94). Uses a tiny psum over
    all devices, which blocks until every process participates."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("sdvar_barrier")


def allreduce_host(x: np.ndarray) -> np.ndarray:
    """Sum a small host-side array across processes (metric reduction —
    reference dist.py:97-106 / trainer.py:81)."""
    if jax.process_count() <= 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x)).sum(axis=0)
    )


def allgather_host(x: np.ndarray) -> np.ndarray:
    """Gather host arrays from every process, stacked on axis 0 (reference
    dist.py:109-119). Requires identical shapes on every process; use
    ``allgather_host_varlen`` when leading dimensions differ."""
    if jax.process_count() <= 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def allgather_host_varlen(x: np.ndarray) -> list:
    """Gather host arrays whose LEADING dimension differs per process
    (reference allgather_diff_shape, dist.py:122-146: gather lengths first,
    pad everyone to the max, gather, then strip the padding). Returns a list
    of per-process arrays in rank order. Trailing dimensions must match."""
    x = np.asarray(x)
    if jax.process_count() <= 1:
        return [x]
    lens = allgather_host(np.asarray([x.shape[0]], np.int64))[:, 0]
    mx = int(lens.max())
    pad = np.zeros((mx,) + x.shape[1:], x.dtype)
    pad[: x.shape[0]] = x
    full = allgather_host(pad)  # (P, mx, ...)
    return [full[r, : int(n)] for r, n in enumerate(lens)]
