"""NaN / anomaly debugging utilities.

Reference capabilities matched (TPU-native redesign, not a port):
  - ``dbg_nan`` flag (reference utils/arg_util.py:137 — defined there, never
    consumed; here it is wired into the training entry point),
  - autograd anomaly mode in local_debug (reference train.py:173-174,
    ``torch.autograd.set_detect_anomaly(True)`` — locates the op that
    produced a NaN in backward),
  - RNG-state logging before sampling (reference models/helpers.py:61-75,
    ``sample_with_debug_log`` prints generator-state hashes).

XLA has no autograd hooks, so anomaly localization works at three levels:
  1. ``enable_debug_nans()`` — flips ``jax_debug_nans``: on failure JAX
     re-runs the jitted program op-by-op un-jitted and raises at the first
     NaN-producing primitive. Exact but slow (host re-execution); best on
     CPU repros.
  2. ``checked(fn)`` — instruments ``fn`` with ``jax.experimental.checkify``
     float checks INSIDE the compiled program; the returned error carries
     the source line of the first NaN/inf producer without ever leaving
     jit. This is the practical anomaly mode on TPU.
  3. ``nan_report(tree)`` — which leaves of a params/grads/metrics pytree
     are bad (count of NaN/inf per leaf), for post-mortem triage.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enable_debug_nans(enable: bool = True) -> None:
    """Global eager NaN checking (level 1). Any jitted function that
    produces a NaN re-runs de-optimized and raises FloatingPointError at
    the producing primitive."""
    jax.config.update("jax_debug_nans", enable)


def nan_report(tree: Any, name: str = "tree") -> List[str]:
    """One line per pytree leaf containing NaN/inf: ``path: nan=a inf=b /n``.

    Host-side scan (level 3); empty list means the tree is clean.
    """
    lines: List[str] = []

    def visit(path, leaf):
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            return
        n_nan = int(np.isnan(a).sum())
        n_inf = int(np.isinf(a).sum())
        if n_nan or n_inf:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            lines.append(f"{name}/{p}: nan={n_nan} inf={n_inf} of {a.size}")

    jax.tree_util.tree_map_with_path(visit, tree)
    return lines


def first_bad_leaf(tree: Any, name: str = "tree") -> Optional[str]:
    """Path of the first leaf with a NaN/inf, or None if clean."""
    lines = nan_report(tree, name)
    return lines[0].split(":")[0] if lines else None


def checked(fn: Callable) -> Callable:
    """Wrap ``fn`` with in-jit float checks (level 2, the TPU anomaly mode).

    Returns ``wrapped(*args) -> (err, out)``; call ``err.throw()`` to raise
    a JaxRuntimeError naming the source line of the first NaN/inf/div0
    inside the compiled program. Compose with jit OUTSIDE the wrap:
    ``jax.jit(checked(fn))``.
    """
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def checked_grad_probe(
    loss_fn: Callable, params: Any, *args: Any
) -> Tuple[Any, jnp.ndarray]:
    """Anomaly-mode probe for one training step: run value_and_grad of
    ``loss_fn(params, *args)`` under checkify float checks and throw if any
    forward OR backward op produced a NaN/inf (reference anomaly mode,
    train.py:173-174). Returns ``(grads, loss)`` when clean.

    Costs one extra fwd+bwd — like torch's detect_anomaly, meant for the
    ``dbg_nan`` debug mode, not the hot loop.
    """

    def value_and_grad(p, *a):
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, *a)
        return loss, grads

    err, (loss, grads) = jax.jit(checked(value_and_grad))(params, *args)
    err.throw()
    return grads, loss


def rng_fingerprint(key: jax.Array) -> str:
    """Stable hex digest of a PRNG key's raw data (reference
    sample_with_debug_log, models/helpers.py:61-75: RNG-state hashes to
    chase reproducibility bugs across runs/hosts)."""
    raw = np.asarray(jax.random.key_data(key)).tobytes()
    return hashlib.sha1(raw).hexdigest()[:16]


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Raise FloatingPointError with a per-leaf report if any leaf of the
    pytree contains NaN/inf."""
    lines = nan_report(tree, name)
    if lines:
        raise FloatingPointError(
            f"non-finite values in {name} ({len(lines)} leaves):\n"
            + "\n".join(lines[:20])
        )
