"""Checkpoint / auto-resume via orbax (sharded, multi-host safe).

Capability parity with the reference ckpt layer (utils/misc.py:340-357
auto_resume by latest mtime; train.py:218-231 save-every-N, master-only
meta): checkpoints hold {step, epoch, params, opt_state, config_json}.

TPU-native design: arrays are written by ``orbax.checkpoint`` — every
process writes its OWN addressable shards (a TP-sharded d30 TrainState never
materializes on one host, unlike a whole-tree ``np.savez``), and restore
reads back into the template's shardings, so resume lands directly on the
mesh. Saving is a collective: all processes must call ``save_checkpoint``;
only the metadata sidecar is master-gated.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax


def _is_master() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, tree: Any,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Write ``ckpt-<step>`` under ckpt_dir. Collective across processes."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt-{step:08d}"))
    os.makedirs(path, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(os.path.join(path, "tree"), tree, force=True)
    ckptr.wait_until_finished()
    if _is_master():
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step, **(meta or {})}, f)
    return path


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict]:
    """Restore arrays into the structure/shapes/SHARDINGS of ``template``
    (shape mismatch raises, matching the reference's config-mismatch
    strictness — trainer.py:192-201). Returns (tree, meta)."""
    ckptr = _checkpointer()
    tree = ckptr.restore(os.path.abspath(os.path.join(path, "tree")),
                         template)
    meta_path = os.path.join(path, "meta.json")
    meta = {"step": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


def auto_resume(ckpt_dir: str, template: Any) -> Tuple[Optional[Any], Dict]:
    """Pick the newest-mtime checkpoint under ckpt_dir (reference
    glob_with_latest_modified_first + auto_resume, utils/misc.py:340-357)."""
    cands = glob.glob(os.path.join(ckpt_dir, "ckpt-*"))
    for path in sorted(cands, key=os.path.getmtime, reverse=True):
        try:
            return load_checkpoint(path, template)
        except Exception as e:  # keep trying older ckpts, like the reference
            print(f"[auto_resume] failed to load {path}: {e}")
    return None, {"step": 0}
