"""Golden-tensor parity tests: resize ops vs torch.nn.functional.interpolate.

The quantizer's numerics (reference: models/quant.py:68,83,150,160,180-192)
depend on exact bicubic/area behavior; these tests pin our matmul-form resize
to PyTorch CPU outputs across every (in, out) pair the 256/512 pipelines use.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sdvar_tpu.config import PATCH_NUMS_256, PATCH_NUMS_512  # noqa: E402
from sdvar_tpu.ops.resize import area_resize, bicubic_resize  # noqa: E402


def _rand(b, c, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, c, h, w)).astype(np.float32)


def _pairs():
    pairs = set()
    for pns in (PATCH_NUMS_256, PATCH_NUMS_512):
        hw = pns[-1]
        for pn in pns:
            pairs.add((pn, hw))   # upsample h_BChw -> full grid (bicubic)
            pairs.add((hw, pn))   # downsample residual/f_hat -> scale (area)
    return sorted(pairs)


@pytest.mark.parametrize("in_size,out_size", _pairs())
def test_bicubic_matches_torch(in_size, out_size):
    x = _rand(2, 3, in_size, in_size, seed=in_size * 100 + out_size)
    ref = F.interpolate(
        torch.from_numpy(x), size=(out_size, out_size), mode="bicubic"
    ).numpy()
    got = np.asarray(bicubic_resize(x, (out_size, out_size)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("in_size,out_size", _pairs())
def test_area_matches_torch(in_size, out_size):
    x = _rand(2, 3, in_size, in_size, seed=in_size * 100 + out_size + 7)
    ref = F.interpolate(
        torch.from_numpy(x), size=(out_size, out_size), mode="area"
    ).numpy()
    got = np.asarray(area_resize(x, (out_size, out_size)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_rectangular_and_batch_dims():
    x = _rand(1, 32, 13, 16)
    ref = F.interpolate(torch.from_numpy(x), size=(16, 10), mode="bicubic").numpy()
    got = np.asarray(bicubic_resize(x, (16, 10)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
