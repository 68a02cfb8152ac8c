"""Pre-tokenized training pipeline: VQVAE-encode the dataset ONCE, train
forever off stored token ids.

The reference tokenizes every batch inside every training step, forever
(reference: trainer.py:105-107 — ``gt_idx_Bl = self.vae_local.img_to_idxBl``);
with a frozen VQVAE that work is identical across epochs. On TPU the f32
tokenize is HALF of a d16 train step (574 of 1118 ms at B=32 — BENCHMARKS.md
training table), so paying it once instead of every step ~doubles training
throughput.

Layout of a token dataset directory (all files written atomically, so an
interrupted run resumes at the first missing shard):

    manifest.json            {num_samples, L, passes, shard_size, ...}
    tokens_00000.npy         (n, passes, L) uint16   [mmap-read at train time]
    labels_00000.npy         (n,) int32
    ...

``passes`` stores several augmentation draws (different crop/flip seeds) per
image; the training-side ``TokenDataset`` rotates the active pass with the
epoch, so augmentation diversity survives pre-tokenization. The default
single pass matches the Python image path exactly (its crop rng is seeded per
index, not per epoch — train/data.py:89), which is what makes the
image-path-vs-token-path equivalence testable bit-for-bit.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import VQVAEConfig
from sdvar_tpu.models import vqvae as VQ

MANIFEST = "manifest.json"


def _tok_name(k: int) -> str:
    return f"tokens_{k:05d}.npy"


def _lab_name(k: int) -> str:
    return f"labels_{k:05d}.npy"


def _atomic_save(path: str, arr: np.ndarray) -> None:
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


def pretokenize_dataset(
    vae_cfg: VQVAEConfig,
    vae_params,
    datasets: Sequence,
    out_dir: str,
    batch: int = 32,
    shard_size: int = 4096,
    tokenize_bf16: bool = False,
    log_every: int = 10,
) -> dict:
    """Encode every image of every dataset pass into token-id shards.

    ``datasets``: one dataset per augmentation pass (same length, same
    labels, different crop seeds). Returns the manifest dict. Resumable:
    shards whose files already exist are skipped.
    """
    n = len(datasets[0])
    passes = len(datasets)
    for d in datasets[1:]:
        assert len(d) == n, "all passes must cover the same samples"
    L = sum(p * p for p in vae_cfg.patch_nums)
    assert vae_cfg.vocab_size <= 65536, "token ids must fit uint16"
    os.makedirs(out_dir, exist_ok=True)

    # bf16 path: channels-last encoder (fastest; same bf16 noise class)
    tok_fn = VQ.img_to_idxBl_nhwc if tokenize_bf16 else VQ.img_to_idxBl

    @jax.jit
    def encode(img):
        return jnp.concatenate(tok_fn(vae_cfg, vae_params, img), axis=1)

    num_shards = (n + shard_size - 1) // shard_size
    manifest = {
        "num_samples": n,
        "L": L,
        "passes": passes,
        "shard_size": shard_size,
        "num_shards": num_shards,
        "patch_nums": list(vae_cfg.patch_nums),
        "vocab_size": vae_cfg.vocab_size,
        "tokenize_bf16": tokenize_bf16,
    }

    t0 = time.time()
    done_imgs = 0
    for k in range(num_shards):
        tpath = os.path.join(out_dir, _tok_name(k))
        lpath = os.path.join(out_dir, _lab_name(k))
        beg, end = k * shard_size, min(n, (k + 1) * shard_size)
        if os.path.exists(tpath) and os.path.exists(lpath):
            done_imgs += (end - beg) * passes
            continue  # resume: shard already complete
        toks = np.empty((end - beg, passes, L), np.uint16)
        labs = np.empty((end - beg,), np.int32)
        for p, ds in enumerate(datasets):
            for off in range(beg, end, batch):
                hi = min(end, off + batch)
                imgs, labels = zip(*(ds[i] for i in range(off, hi)))
                img = np.stack(imgs)
                pad = batch - img.shape[0]
                if pad:
                    img = np.concatenate([img, np.zeros_like(img[:1]).repeat(pad, 0)])
                ids = np.asarray(encode(jnp.asarray(img)))
                if pad:
                    ids = ids[:-pad]
                toks[off - beg : hi - beg, p] = ids.astype(np.uint16)
                if p == 0:
                    labs[off - beg : hi - beg] = np.asarray(labels, np.int32)
                done_imgs += hi - off
                if log_every and (off // batch) % log_every == 0:
                    rate = done_imgs / max(time.time() - t0, 1e-9)
                    print(f"[pretokenize] shard {k}/{num_shards} pass {p} "
                          f"{done_imgs}/{n * passes} ({rate:.1f} img/s)",
                          flush=True)
        _atomic_save(tpath, toks)
        _atomic_save(lpath, labs)

    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


class TokenDataset:
    """Training-side view over a pre-tokenized directory.

    Same interface as the image datasets (len / getitem -> (array, label)),
    so the resumable epoch-seeded sampler (DistInfiniteBatchSampler) works
    unchanged; ``__getitem__`` returns the (L,) int32 token row for the
    ACTIVE augmentation pass — call ``set_epoch`` to rotate passes."""

    def __init__(self, root: str):
        with open(os.path.join(root, MANIFEST)) as f:
            self.manifest = json.load(f)
        m = self.manifest
        self.root = root
        self.shard_size = int(m["shard_size"])
        self.passes = int(m["passes"])
        self.L = int(m["L"])
        self.num_samples = int(m["num_samples"])
        self.pass_idx = 0
        # mmap every shard once; rows are touched lazily by the sampler
        self._toks: List[np.ndarray] = []
        self._labs: List[np.ndarray] = []
        for k in range(int(m["num_shards"])):
            self._toks.append(
                np.load(os.path.join(root, _tok_name(k)), mmap_mode="r"))
            self._labs.append(np.load(os.path.join(root, _lab_name(k))))

    def set_epoch(self, ep: int) -> None:
        self.pass_idx = ep % self.passes

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, i: int):
        k, j = divmod(i, self.shard_size)
        return (np.asarray(self._toks[k][j, self.pass_idx], np.int32),
                int(self._labs[k][j]))


def build_token_datasets_for_passes(
    data_root: Optional[str], reso: int, passes: int, seed: int = 0,
    hflip: bool = False, synthetic_len: int = 1024,
) -> List:
    """One image dataset per augmentation pass (distinct crop/flip seeds)."""
    from sdvar_tpu.train.data import FolderImageNet, SyntheticImageNet

    out = []
    for p in range(passes):
        if data_root and os.path.isdir(data_root):
            out.append(FolderImageNet(data_root, reso=reso, train=True,
                                      hflip=hflip or p > 0,
                                      seed=seed + 1_000_000 * p))
        else:
            out.append(SyntheticImageNet(reso=reso, length=synthetic_len,
                                         seed=seed + 1_000_000 * p))
    return out
