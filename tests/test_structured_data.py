"""StructuredSynthImages: the learnable on-chip training-drill dataset
(train/data.py). Unlike SyntheticImageNet (pure noise), classes must be
separable — that's what makes draft/target pairs land at PARTIAL accuracy
(the organic speculative regime, reference models/var.py:1199-1222)."""

import numpy as np

from sdvar_tpu.train.data import StructuredSynthImages, write_structured_folder


def test_deterministic_and_in_range():
    ds = StructuredSynthImages(reso=64, num_classes=8, length=64, seed=3)
    a, ca = ds[5]
    b, cb = ds[5]
    np.testing.assert_array_equal(a, b)
    assert ca == cb == 5 % 8
    assert a.shape == (3, 64, 64) and a.dtype == np.float32
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_classes_are_separable():
    """Mean inter-class image distance must dominate intra-class distance
    (else the dataset is noise and nothing can be learned from it)."""
    ds = StructuredSynthImages(reso=48, num_classes=8, length=128, seed=0)
    per_class = {}
    for i in range(64):
        img, c = ds[i]
        per_class.setdefault(c, []).append(img.ravel())
    means = {c: np.mean(v, axis=0) for c, v in per_class.items()}
    intra = np.mean([np.linalg.norm(x - means[c])
                     for c, v in per_class.items() for x in v])
    cs = sorted(means)
    inter = np.mean([np.linalg.norm(means[a] - means[b])
                     for i, a in enumerate(cs) for b in cs[i + 1:]])
    # phase/position jitter keeps intra-class distance deliberately high
    # (that stochasticity is what keeps fine scales partially predictable);
    # the class palette/band still has to dominate it
    assert inter > 1.2 * intra, (inter, intra)


def test_folder_write_and_folder_dataset_roundtrip(tmp_path):
    from sdvar_tpu.train.data import FolderImageNet

    root = str(tmp_path / "imgs")
    n = write_structured_folder(root, num_classes=4, per_class=3, reso=36,
                                seed=1)
    assert n == 12
    ds = FolderImageNet(root, reso=32, train=True)
    assert len(ds) == 12
    img, label = ds[0]
    assert img.shape == (3, 32, 32)
    assert 0 <= label < 4
    assert img.min() >= -1.0 and img.max() <= 1.0
    # idempotent: re-running writes nothing new
    assert write_structured_folder(root, 4, 3, reso=36, seed=1) == 12
