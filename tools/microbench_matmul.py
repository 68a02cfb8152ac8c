"""Microbench: batched einsum time vs token-count padding (scale-8 fc2 case).

Usage: python tools/microbench_matmul.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdvar_jax_cache")

B, K, N = 32, 7680, 1920


@jax.jit
def f(x, w):
    return jnp.einsum("blc,ck->blk", x, w,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (K, N), jnp.bfloat16)
for L in (169, 176, 192, 256, 100, 128):
    x = jax.random.normal(key, (B, L, K), jnp.bfloat16)
    f(x, w).block_until_ready()
    times = []
    for _ in range(6):
        t0 = time.time()
        f(x, w).block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    fl = 2 * B * L * K * N
    print(f"L={L:4d}: {best*1e3:7.3f} ms  {fl/best/1e12:6.1f} TFLOP/s",
          flush=True)
