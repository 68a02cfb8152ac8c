"""Shared constants/configs for the multi-process test modules
(test_multiprocess.py / test_multiprocess_infer.py parents + their worker
subprocesses). Import-side-effect free: the workers do their own JAX
platform setup BEFORE importing this."""

import contextlib
import fcntl
import os
import tempfile

PNS = (1, 2, 3)
SEED = 3
GLOBAL_BS = 128
MAX_ITERS = 8


@contextlib.contextmanager
def multiprocess_launch_lock():
    """Cross-xdist-worker mutex: each multi-process fixture spawns 2 OS
    processes x 4 virtual devices with gloo collectives; two such launches
    overlapping on a small CI box starve each other into distributed-init
    timeouts (observed as nonzero worker returncodes in the full suite).
    Serialize the launches with a file lock."""
    path = os.path.join(tempfile.gettempdir(), "sdvar_mp_launch.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def tiny_configs():
    from sdvar_tpu.config import VARConfig, VQVAEConfig

    vae_cfg = VQVAEConfig(vocab_size=32, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, patch_nums=PNS, vocab_size=32, Cvae=8,
                        head_dim=16, num_classes=10, cond_drop_rate=0.0,
                        drop_path_rate=0.0)
    return vae_cfg, var_cfg
