"""Data pipeline: ImageNet-folder loading + deterministic resumable sampling.

Capability parity with reference utils/data.py (build_dataset: resize shorter
edge to 1.125x reso with LANCZOS, random/center crop, optional hflip, output
in [-1, 1]) and utils/data_sampler.py (EvalDistributedSampler — contiguous
per-rank shards; DistInfiniteBatchSampler — epoch-seeded global randperm,
fill-last, per-rank contiguous slice, resumable via start_ep/start_it).

TPU-first notes: samplers are pure-numpy index generators (host-side); the
image decode path uses PIL only when a real dataset directory exists, with a
deterministic synthetic fallback so every test and smoke run works without
ImageNet (the reference's local_debug mode, arg_util.py:136, train.py:140-162).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def normalize_01_into_pm1(x: np.ndarray) -> np.ndarray:
    """[0, 1] -> [-1, 1] (reference: utils/data.py:8)."""
    return x * 2.0 - 1.0


class SyntheticImageNet:
    """Deterministic random dataset with the ImageNet interface; stands in
    for the gitignored dataset in tests/smoke runs."""

    def __init__(self, reso: int = 256, num_classes: int = 1000,
                 length: int = 1024, seed: int = 0):
        self.reso, self.num_classes, self.length = reso, num_classes, length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        rng = np.random.default_rng(self.seed * 1_000_003 + i)
        img = rng.uniform(-1, 1, (3, self.reso, self.reso)).astype(np.float32)
        label = int(rng.integers(0, self.num_classes))
        return img, label


class FolderImageNet:
    """DatasetFolder-equivalent over ``root/{class_dir}/*.{jpg,png,jpeg}``
    (reference: utils/data.py:12-38). train: mid-resize 1.125x + random crop
    (+ optional hflip); val: center crop."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, root: str, reso: int = 256, train: bool = True,
                 hflip: bool = False, mid_reso: float = 1.125, seed: int = 0):
        from PIL import Image  # noqa: F401 — fail fast if PIL missing

        self.root, self.reso, self.train = root, reso, train
        self.hflip, self.seed = hflip, seed
        self.mid = round(mid_reso * reso)
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(self.EXTS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[i]
        img = Image.open(path).convert("RGB")
        w, h = img.size
        # resize shorter edge to mid_reso (LANCZOS — utils/data.py:21-24)
        scale = self.mid / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)),
                         Image.LANCZOS)
        w, h = img.size
        if self.train:
            rng = np.random.default_rng(self.seed * 7_777_777 + i)
            x0 = int(rng.integers(0, w - self.reso + 1))
            y0 = int(rng.integers(0, h - self.reso + 1))
            if self.hflip and rng.uniform() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            x0, y0 = (w - self.reso) // 2, (h - self.reso) // 2
        img = img.crop((x0, y0, x0 + self.reso, y0 + self.reso))
        arr = np.asarray(img, dtype=np.float32).transpose(2, 0, 1) / 255.0
        return normalize_01_into_pm1(arr), label


def build_dataset(root: Optional[str], reso: int = 256, train: bool = True,
                  hflip: bool = False, synthetic_len: int = 1024):
    """Folder dataset when root exists, synthetic otherwise."""
    if root and os.path.isdir(root):
        return FolderImageNet(root, reso=reso, train=train, hflip=hflip)
    return SyntheticImageNet(reso=reso, length=synthetic_len)


class EvalDistributedSampler:
    """Contiguous per-rank shards without padding
    (reference: utils/data_sampler.py:6-17)."""

    def __init__(self, length: int, num_replicas: int, rank: int):
        per = (length + num_replicas - 1) // num_replicas
        beg = per * rank
        end = min(length, beg + per)
        self.indices = list(range(beg, end))

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)


class DistInfiniteBatchSampler:
    """Epoch-seeded global randperm, fill-last, per-rank contiguous slice,
    resumable via (start_ep, start_it) (reference:
    utils/data_sampler.py:67-103)."""

    def __init__(self, dataset_len: int, glb_batch_size: int,
                 world_size: int = 1, rank: int = 0,
                 seed: int = 0, shuffle: bool = True, fill_last: bool = True,
                 start_ep: int = 0, start_it: int = 0):
        assert glb_batch_size % world_size == 0
        self.dataset_len = dataset_len
        self.glb_batch_size = glb_batch_size
        self.batch_size = glb_batch_size // world_size
        self.world_size, self.rank = world_size, rank
        self.seed, self.shuffle, self.fill_last = seed, shuffle, fill_last
        self.iters_per_ep = (
            dataset_len // glb_batch_size
            if not fill_last
            else (dataset_len + glb_batch_size - 1) // glb_batch_size
        )
        self.epoch = start_ep
        self.start_it = start_it

    def _epoch_global_indices(self, ep: int) -> np.ndarray:
        g = np.random.default_rng(self.seed + ep) if self.shuffle else None
        idx = (
            g.permutation(self.dataset_len)
            if g is not None
            else np.arange(self.dataset_len)
        )
        total = self.iters_per_ep * self.glb_batch_size
        if total > len(idx):  # fill-last: pad by wrapping
            pad = total - len(idx)
            idx = np.concatenate([idx, idx[:pad]])
        return idx[:total]

    def __iter__(self) -> Iterator[List[int]]:
        while True:
            idx = self._epoch_global_indices(self.epoch)
            # per-rank contiguous slice (data_sampler.py:96-100)
            per = self.iters_per_ep * self.batch_size
            mine = idx[self.rank * per : (self.rank + 1) * per]
            start = self.start_it
            self.start_it = 0
            for it in range(start, self.iters_per_ep):
                yield mine[it * self.batch_size : (it + 1) * self.batch_size].tolist()
            self.epoch += 1


def batch_arrays(dataset, indices: Sequence[int]):
    imgs, labels = zip(*(dataset[i] for i in indices))
    return np.stack(imgs), np.asarray(labels, dtype=np.int32)
