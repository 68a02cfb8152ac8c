"""Shared helper for AOT TPU topology tests (NOT a test module).

``get_topology_desc`` initializes a local libtpu, which takes a global
lockfile; two xdist workers creating topologies concurrently (or racing the
ambient axon terminal) abort with "Internal error when accessing libtpu
multi-process lockfile". Serialize creations across workers with a file
lock and retry the transient abort before skipping."""

import contextlib
import fcntl
import os
import tempfile
import time


@contextlib.contextmanager
def _topology_lock():
    path = os.path.join(tempfile.gettempdir(), "sdvar_aot_topology.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def get_tpu_topology(name: str, attempts: int = 6, delay_s: float = 3.0):
    """Topology desc for ``name`` (e.g. "v5e:2x4"), serialized + retried.
    Raises the last error if the platform genuinely has no AOT support —
    callers turn that into a pytest.skip."""
    from jax.experimental import topologies

    last = None
    for _ in range(attempts):
        try:
            with _topology_lock():
                return topologies.get_topology_desc(platform="tpu",
                                                    topology_name=name)
        except Exception as e:
            last = e
            if "lockfile" in str(e):
                time.sleep(delay_s)
                continue
            raise
    raise last
