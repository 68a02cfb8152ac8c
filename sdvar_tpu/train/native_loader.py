"""ctypes bindings for the native C++ data-loader runtime (csrc/dataloader.cpp).

The reference's input pipeline is torchvision's C++ DatasetFolder + PIL
(reference: utils/data.py); this is the first-party native equivalent:
multithreaded JPEG/PNG decode + Lanczos resize + crop + normalize with a
bounded prefetch queue, plus a threaded PNG writer for FID sample dumps.

Build happens on demand (g++ available in the image); falls back cleanly if
the toolchain or libs are missing — callers should use
``native_available()`` and keep the Python path as fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERR: Optional[str] = None


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def _lib_path() -> str:
    return os.path.join(_repo_root(), "csrc", "libsdvar_data.so")


def build_native(force: bool = False) -> Optional[str]:
    """Compile csrc/dataloader.cpp -> libsdvar_data.so. Returns an error
    string or None on success."""
    src = os.path.join(_repo_root(), "csrc", "dataloader.cpp")
    out = _lib_path()
    if not force and os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out,
        "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except Exception as e:
        return f"{type(e).__name__}: {e}"
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_ERR
    if _LIB is not None:
        return _LIB
    err = build_native()
    if err is not None:
        _BUILD_ERR = err
        return None
    lib = ctypes.CDLL(_lib_path())
    lib.sdvar_loader_create.restype = ctypes.c_void_p
    lib.sdvar_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.sdvar_loader_enqueue.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.sdvar_loader_next.restype = ctypes.c_int64
    lib.sdvar_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.sdvar_loader_errors.restype = ctypes.c_int64
    lib.sdvar_loader_errors.argtypes = [ctypes.c_void_p]
    lib.sdvar_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.sdvar_write_pngs.restype = ctypes.c_int64
    lib.sdvar_write_pngs.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _BUILD_ERR


class NativeImageLoader:
    """Multithreaded decode/augment pipeline over a file list.

    Usage:
        loader = NativeImageLoader(paths, labels, reso=256, train=True)
        loader.enqueue(epoch_indices)      # from DistInfiniteBatchSampler
        imgs, labels, idxs = loader.next_batch(64)
    """

    def __init__(self, paths: Sequence[str], labels: Sequence[int],
                 reso: int = 256, mid_reso: float = 1.125, train: bool = True,
                 hflip: bool = False, seed: int = 0,
                 num_threads: int = 8, queue_cap: int = 128):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_BUILD_ERR}")
        self._lib = lib
        self.reso = reso
        n = len(paths)
        self._path_bufs = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * n)(*self._path_bufs)
        lab = np.asarray(labels, dtype=np.int32)
        self._h = lib.sdvar_loader_create(
            arr, lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, reso, round(mid_reso * reso), int(train), int(hflip),
            seed, num_threads, queue_cap,
        )

    def enqueue(self, indices: Sequence[int]):
        idx = np.asarray(indices, dtype=np.int64)
        self._lib.sdvar_loader_enqueue(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
        )

    def next_batch(self, batch: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        imgs = np.empty((batch, 3, self.reso, self.reso), np.float32)
        labels = np.empty((batch,), np.int32)
        idxs = np.empty((batch,), np.int64)
        got = self._lib.sdvar_loader_next(
            self._h, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), batch,
        )
        assert got == batch, (got, batch)
        return imgs, labels, idxs

    @property
    def errors(self) -> int:
        return int(self._lib.sdvar_loader_errors(self._h))

    def close(self):
        if self._h:
            self._lib.sdvar_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_pngs_native(out_dir: str, images_u8_nhwc: np.ndarray,
                      start_idx: int = 0, num_threads: int = 8) -> int:
    """Threaded PNG dump for FID sampling; returns #written."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_BUILD_ERR}")
    os.makedirs(out_dir, exist_ok=True)
    x = np.ascontiguousarray(images_u8_nhwc, dtype=np.uint8)
    n, h, w, c = x.shape
    assert c == 3, x.shape
    return int(lib.sdvar_write_pngs(
        out_dir.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, start_idx, num_threads,
    ))
