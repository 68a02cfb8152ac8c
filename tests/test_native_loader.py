"""Native C++ data-loader tests: decode/resize/crop pipeline vs the PIL
reference path, and the threaded PNG writer round-trip."""

import os
import tempfile

import numpy as np
import pytest

from sdvar_tpu.train import native_loader as NL

pytestmark = pytest.mark.skipif(
    not NL.native_available(),
    reason=f"native loader unavailable: {NL.build_error()}",
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _make_images(d, n=4, size=(80, 64)):
    paths, labels = [], []
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        p = os.path.join(d, f"img{i}.png" if i % 2 else f"img{i}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)
        labels.append(i % 3)
    return paths, labels


def test_batch_shapes_and_range():
    with tempfile.TemporaryDirectory() as d:
        paths, labels = _make_images(d)
        loader = NL.NativeImageLoader(paths, labels, reso=48, train=True,
                                      seed=1, num_threads=2)
        loader.enqueue(list(range(8)))
        imgs, labs, idxs = loader.next_batch(8)
        loader.close()
    assert imgs.shape == (8, 3, 48, 48)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    assert set(labs.tolist()) <= {0, 1, 2}
    # every enqueued index came back exactly once (order may differ)
    assert sorted(idxs.tolist()) == list(range(8))


def test_val_center_crop_matches_pil():
    """Center-crop val pipeline vs PIL LANCZOS + center crop (the reference
    transform, utils/data.py:21-33). Lanczos implementations differ at the
    subpixel level; require close agreement, not bitwise."""
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        p = os.path.join(d, "a.png")
        Image.fromarray(arr).save(p)

        reso, mid = 64, 72
        loader = NL.NativeImageLoader([p], [0], reso=reso, train=False,
                                      mid_reso=mid / reso, num_threads=1)
        loader.enqueue([0])
        imgs, _, _ = loader.next_batch(1)
        loader.close()

        img = Image.open(p).convert("RGB")
        w, h = img.size
        sc = mid / min(w, h)
        img = img.resize((round(w * sc), round(h * sc)), Image.LANCZOS)
        w, h = img.size
        x0, y0 = (w - reso) // 2, (h - reso) // 2
        img = img.crop((x0, y0, x0 + reso, y0 + reso))
        ref = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0 * 2 - 1

    diff = np.abs(imgs[0] - ref)
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.99) < 0.1


def test_deterministic_train_crops():
    with tempfile.TemporaryDirectory() as d:
        paths, labels = _make_images(d, n=2)

        def run():
            loader = NL.NativeImageLoader(paths, labels, reso=32, train=True,
                                          seed=7, num_threads=1)
            loader.enqueue([0, 1])
            imgs, _, idxs = loader.next_batch(2)
            loader.close()
            return imgs[np.argsort(idxs)]

        a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_bad_file_counts_error_not_crash():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "junk.jpg")
        with open(p, "wb") as f:
            f.write(b"not an image at all")
        loader = NL.NativeImageLoader([p], [5], reso=16, num_threads=1)
        loader.enqueue([0])
        imgs, labs, _ = loader.next_batch(1)
        errs = loader.errors
        loader.close()
    assert errs == 1
    assert labs[0] == -1
    assert np.all(imgs == 0)


def test_png_writer_roundtrip():
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (6, 20, 24, 3), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        n = NL.write_pngs_native(d, imgs, start_idx=10, num_threads=3)
        assert n == 6
        back = np.asarray(Image.open(os.path.join(d, "000012.png")))
    np.testing.assert_array_equal(back, imgs[2])
