"""Fused INT8-weight matmul kernel vs the XLA dequant reference
(interpret mode on CPU; compiles natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdvar_tpu.ops.pallas.matmul_int8 import int8_matmul, int8_matmul_blc
from sdvar_tpu.ops.quantization import dequantize_weight, quantize_weight


def _setup(M, K, N, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    qw = quantize_weight(w, axis=-2)
    return x, qw


@pytest.mark.parametrize("M,K,N", [
    (8, 128, 128),          # single block
    (32, 1920, 1920),       # proj-like, K blocked at 960? (1920 % 1024 -> 640)
    (256, 1920, 5760),      # qkv-like
    (128, 3840, 1280),      # fc2-like with K blocking
])
def test_int8_matmul_parity(M, K, N):
    x, qw = _setup(M, K, N)
    ref = x @ dequantize_weight(qw, jnp.float32)
    got = int8_matmul(x, qw.q, qw.scale, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


def test_int8_matmul_blc():
    B, L, K, N = 2, 16, 256, 384
    x, qw = _setup(B * L, K, N, seed=3)
    x3 = x.reshape(B, L, K)
    ref = (x @ dequantize_weight(qw, jnp.float32)).reshape(B, L, N)
    got = int8_matmul_blc(x3, qw.q, qw.scale, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


def test_int8_matmul_bf16_activations():
    M, K, N = 64, 512, 256
    x, qw = _setup(M, K, N, seed=7)
    xb = x.astype(jnp.bfloat16)
    ref = (xb.astype(jnp.float32)
           @ dequantize_weight(qw, jnp.float32)).astype(jnp.float32)
    got = int8_matmul(xb, qw.q, qw.scale, interpret=True,
                      out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=5e-2, atol=5e-2)
