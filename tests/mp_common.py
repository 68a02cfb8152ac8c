"""Shared constants/configs for the multi-process test pair
(test_multiprocess.py parent + mp_worker.py subprocess). Import-side-effect
free: the worker does its own JAX platform setup BEFORE importing this."""

PNS = (1, 2, 3)
SEED = 3
GLOBAL_BS = 128
MAX_ITERS = 8


def tiny_configs():
    from sdvar_tpu.config import VARConfig, VQVAEConfig

    vae_cfg = VQVAEConfig(vocab_size=32, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, patch_nums=PNS, vocab_size=32, Cvae=8,
                        head_dim=16, num_classes=10, cond_drop_rate=0.0,
                        drop_path_rate=0.0)
    return vae_cfg, var_cfg
