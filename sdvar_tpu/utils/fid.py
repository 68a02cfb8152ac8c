"""FID evaluation packaging.

Capability parity with reference ``create_npz_from_sample_folder``
(utils/misc.py:360-381): pack exactly N (default 50,000) PNG samples into an
.npz consumable by the OpenAI guided-diffusion FID toolkit against
VIRTUAL_imagenet256_labeled.npz (protocol: reference README.md:151-157).

Also provides the direct array path (no PNG round-trip) for TPU-side
sample-generation pipelines.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np


def create_npz_from_sample_folder(sample_dir: str, num: int = 50_000,
                                  out_path: Optional[str] = None) -> str:
    """Pack {sample_dir}/{000000..}.png into {sample_dir}.npz (uint8 NHWC)."""
    from PIL import Image

    samples = []
    for i in range(num):
        path = os.path.join(sample_dir, f"{i:06d}.png")
        samples.append(np.asarray(Image.open(path), dtype=np.uint8))
    arr = np.stack(samples)
    assert arr.shape == (num,) + arr.shape[1:], arr.shape
    out_path = out_path or f"{sample_dir}.npz"
    np.savez(out_path, arr_0=arr)
    print(f"[fid] saved {arr.shape} to {out_path}")
    return out_path


def images01_to_uint8(imgs_BCHW: np.ndarray) -> np.ndarray:
    """[0,1] float (B, 3, H, W) -> uint8 (B, H, W, 3)."""
    x = np.clip(np.asarray(imgs_BCHW), 0.0, 1.0)
    return (x * 255.0).round().astype(np.uint8).transpose(0, 2, 3, 1)


def create_npz_from_arrays(batches: Iterable[np.ndarray], out_path: str,
                           num: int = 50_000) -> str:
    """Stream generated image batches ((B, 3, H, W) in [0,1]) straight into
    the FID npz without touching PNG files."""
    chunks, total = [], 0
    for b in batches:
        u8 = images01_to_uint8(b)
        chunks.append(u8)
        total += u8.shape[0]
        if total >= num:
            break
    arr = np.concatenate(chunks)[:num]
    assert arr.shape[0] == num, (arr.shape, num)
    np.savez(out_path, arr_0=arr)
    print(f"[fid] saved {arr.shape} to {out_path}")
    return out_path


def save_sample_pngs(imgs_BCHW: np.ndarray, out_dir: str, start_idx: int = 0):
    u8 = images01_to_uint8(imgs_BCHW)
    # threaded native writer when available (csrc/dataloader.cpp); the 50k
    # FID dump is IO-bound through PIL
    try:
        from sdvar_tpu.train.native_loader import (
            native_available,
            write_pngs_native,
        )

        if native_available():
            write_pngs_native(out_dir, u8, start_idx=start_idx)
            return
    except Exception:
        pass
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, im in enumerate(u8):
        Image.fromarray(im).save(
            os.path.join(out_dir, f"{start_idx + i:06d}.png")
        )
