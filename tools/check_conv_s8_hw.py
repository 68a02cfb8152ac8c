"""Hardware exactness check for the INT8 implicit-GEMM conv kernel.

The interpret-mode tests (tests/test_conv_s8.py) prove the math; this script
proves the MOSAIC-COMPILED kernel on the real TPU, where correctness of the
horizontal taps additionally depends on pltpu.bitcast byte packing (low byte
== lowest W index) that interpret mode does not model (round-4 advisor
finding). Compares conv3x3_s8 against the XLA integer reference
(s8 x s8 -> f32-HIGHEST conv, exact for |acc| < 2^24) on decoder-like shapes.

Run on hardware:  python tools/check_conv_s8_hw.py
Exit 0 == exact (atol 1e-4 f32 scale/bias rounding only).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from sdvar_tpu.ops.pallas.conv_s8 import conv3x3_s8, eligible


def _ref_conv(x8, w8, scale, bias):
    y = jax.lax.conv_general_dilated(
        x8.astype(jnp.float32), w8.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y * scale[None, None, None, :] + bias


def main() -> int:
    assert jax.default_backend() in ("tpu", "axon"), (
        "hardware check requires a TPU backend, got " + jax.default_backend())
    worst = 0.0
    # real decoder shapes (256px serving: levels 32..256) + edge-y smalls
    for (B, H, W, C, O) in [
        (2, 16, 32, 8, 12),
        (1, 8, 64, 4, 4),
        (4, 64, 64, 160, 160),
        (2, 128, 128, 160, 160),
        (1, 256, 256, 160, 3),
    ]:
        rng = np.random.default_rng(B * H + W + C)
        x8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), np.int8))
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, C, O), np.int8))
        scale = jnp.asarray(rng.uniform(5e-4, 2e-3, O).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(O).astype(np.float32))
        assert eligible(x8.shape)
        out = np.asarray(conv3x3_s8(x8, w8, scale, bias,
                                    out_dtype=jnp.float32))
        ref = np.asarray(_ref_conv(x8, w8, scale, bias))
        d = np.abs(out - ref).max()
        worst = max(worst, float(d))
        print(f"  ({B},{H},{W},{C})->{O}: max|delta|={d:.2e}", flush=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
    print(f"[conv_s8 hw] EXACT on {jax.devices()[0].device_kind} "
          f"(worst {worst:.2e})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
