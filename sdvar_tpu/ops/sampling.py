"""Top-k / top-p filtered categorical sampling and gumbel-softmax.

Capability parity with the reference sampling kernels
(reference: models/helpers.py:6-36): identical top-k and top-p masking
semantics (including torch's keep-the-largest tie handling for top-p), but
sampling itself uses the Gumbel-max trick with JAX PRNG keys instead of
``torch.multinomial`` — same distribution, deterministic under a key, and a
single fused argmax on TPU instead of a CDF inversion.

RNG discipline (the reference's hardest-won lesson, tmp/var.py:341-382:
separate draft/target generators so outputs are entry_num-invariant): callers
derive the key for scale ``si`` via ``jax.random.fold_in(stream_key, si)``,
making every scale's sample independent of HOW the loop arrived there —
entry_num/gamma invariance holds by construction, not by careful state
threading.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)

_SAMPLER = "auto"


def set_sampler_impl(impl: str) -> None:
    """"auto" = fused Pallas kernel on TPU (sort-free bisection thresholds +
    in-kernel Gumbel; ~22 ms of top-k sorts removed from the d30 decode),
    XLA elsewhere. "xla" forces the sort-based path (bitwise-reproducible
    with jax.random streams). Read at trace time."""
    global _SAMPLER
    assert impl in ("auto", "xla", "pallas"), impl
    _SAMPLER = impl


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    data = jax.random.key_data(key) if jax.dtypes.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    data = data.astype(jnp.uint32).reshape(-1)
    return (data[0] ^ data[-1]).astype(jnp.int32)


def _is_key_array(key: jax.Array) -> bool:
    return key.ndim > 0 and jax.dtypes.issubdtype(key.dtype,
                                                  jax.dtypes.prng_key)


def _row_seeds_from_keys(key: jax.Array, shape) -> jnp.ndarray:
    """(B,) key array + logits shape (B, l..., V) -> (B*l,) int32 per-row
    seeds. Depends only on (request key, position within the request), so a
    request's samples are independent of its batch slot."""
    seeds_b = jax.vmap(_seed_from_key)(key)            # (B,)
    l = 1
    for d in shape[1:-1]:
        l *= d
    pos = jnp.arange(l, dtype=jnp.int32) * jnp.int32(
        np.uint32(0x9E3779B9).astype(np.int32))
    return (seeds_b[:, None] ^ pos[None, :]).reshape(-1)


def _fused_sampler_ok(logits: jnp.ndarray, key: jax.Array, top_k: int) -> bool:
    from sdvar_tpu.ops.partition import pallas_interpret

    if _SAMPLER == "xla" or top_k <= 0:
        return False
    if _SAMPLER == "auto" and jax.default_backend() not in ("tpu", "axon") \
            and not pallas_interpret():
        return False
    if _is_key_array(key) and key.shape[0] != logits.shape[0]:
        return False  # one key per batch row required for per-row streams
    V = logits.shape[-1]
    M = 1
    for d in logits.shape[:-1]:
        M *= d
    return V % 128 == 0 and M % 8 == 0


def mask_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep the k largest logits per row; others -> -inf
    (reference: models/helpers.py:8-10). Static k."""
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def mask_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering with torch-parity semantics
    (reference: models/helpers.py:11-15): sort ascending, drop entries whose
    ascending-softmax-cumsum <= 1-p, never drop the largest."""
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    remove_sorted = remove_sorted.at[..., -1].set(False)
    idx = jnp.argsort(logits, axis=-1)
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, idx, remove_sorted, axis=-1,
                                inplace=False)
    return jnp.where(remove, NEG_INF, logits)


def fold_key(key: jax.Array, data: int) -> jax.Array:
    """fold_in that transparently handles batched key arrays (one key per
    batch row — serving determinism: a request's samples are independent of
    which batch it was scheduled into)."""
    if key.ndim > 0 and jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.vmap(lambda k: jax.random.fold_in(k, data))(key)
    return jax.random.fold_in(key, data)


def _gumbel_like(key: jax.Array, shape, batch_axis_size: int) -> jnp.ndarray:
    if key.ndim > 0 and jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        assert key.shape[0] == batch_axis_size, (key.shape, batch_axis_size)
        return jax.vmap(
            lambda k: jax.random.gumbel(k, shape[1:], dtype=jnp.float32)
        )(key)
    return jax.random.gumbel(key, shape, dtype=jnp.float32)


def sample_with_top_k_top_p(
    logits_BlV: jnp.ndarray, key: jax.Array,
    top_k: int = 0, top_p: float = 0.0,
) -> jnp.ndarray:
    """Sample token ids (B, l) from filtered logits via Gumbel-max.

    ``key`` may be a single PRNG key (shared across the batch, reference
    semantics) or a (B,)-shaped key array for per-request streams.

    Fast path when top_k > 0: work entirely in the top-k domain.
    ``lax.top_k`` returns the k values sorted descending, so nucleus
    filtering is a prefix-sum over k entries instead of a full-vocab sort —
    identical semantics to the reference masking (keep descending position j
    iff the probability mass of positions < j is still < p; the argmax is
    always kept, matching helpers.py:14's never-remove-the-last rule), and
    sampling happens over the k-domain with the result gathered through the
    top-k indices. Measured on v5e (d30 B=16 decode): full-vocab top-p
    costs ~30% of end-to-end decode; this path removes it.
    """
    logits = logits_BlV.astype(jnp.float32)
    V = logits.shape[-1]
    if _fused_sampler_ok(logits, key, top_k):
        from sdvar_tpu.ops.partition import (
            pallas_interpret,
            sharded_fused_sample,
            tp_mesh_active,
        )
        from sdvar_tpu.ops.pallas.sampling import fused_sample

        mesh_active = tp_mesh_active()
        if _is_key_array(key):
            row_seeds = _row_seeds_from_keys(key, logits.shape)
            if mesh_active:
                # Mosaic kernels need explicit sharding (ops/partition);
                # per-row streams are topology-invariant by construction
                out = sharded_fused_sample(logits, row_seeds, top_k, top_p,
                                           interpret=pallas_interpret())
                if out is not None:
                    return out
            else:
                return fused_sample(logits, jnp.int32(0), top_k, top_p,
                                    row_seeds=row_seeds,
                                    interpret=pallas_interpret())
        elif not mesh_active:
            return fused_sample(logits, _seed_from_key(key), top_k, top_p,
                                interpret=pallas_interpret())
        # mesh + scalar key (or indivisible shapes): the XLA path below
        # partitions deterministically and stays topology-invariant
    if top_k > 0 and top_k < V:
        vals, idxs = jax.lax.top_k(logits, top_k)  # descending
        if top_p > 0.0:
            probs = jax.nn.softmax(vals, axis=-1)
            prior = jnp.cumsum(probs, axis=-1) - probs  # mass before pos j
            vals = jnp.where(prior < top_p, vals, NEG_INF)
        g = _gumbel_like(key, vals.shape, vals.shape[0])
        j = jnp.argmax(vals + g, axis=-1)
        return jnp.take_along_axis(idxs, j[..., None], axis=-1)[..., 0].astype(
            jnp.int32
        )
    masked = mask_top_p(mask_top_k(logits, top_k), top_p)
    g = _gumbel_like(key, masked.shape, masked.shape[0])
    return jnp.argmax(masked + g, axis=-1).astype(jnp.int32)


def greedy(logits_BlV: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits_BlV, axis=-1).astype(jnp.int32)


def gumbel_softmax(
    logits: jnp.ndarray, key: Optional[jax.Array], tau: float = 1.0,
    hard: bool = False, axis: int = -1,
) -> jnp.ndarray:
    """Gumbel-softmax (reference gumbel_softmax_with_rng,
    models/helpers.py:22-36); used by the ``more_smooth`` decode mode."""
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                            dtype=y_soft.dtype)
    return y_hard + jax.lax.stop_gradient(y_soft) - y_soft


def _cfg_groups() -> int:
    """Data-axis size of the registered TP mesh (trace-time; 1 = no mesh).

    Governs the CFG doubled-batch LAYOUT: with a >1-way data axis, cond and
    uncond rows are interleaved per data shard ([c_0 u_0 | c_1 u_1 | ...] in
    shard-major blocks) instead of the reference's global [cond ‖ uncond]
    concat (reference: models/var.py:162,188). Under P("data") sharding of
    the 2B axis every shard then holds exactly its own requests' cond AND
    uncond rows, so the doubling, the halves split, and the CFG mix are all
    shard-LOCAL — the global concat instead misaligns with the sharding and
    GSPMD inserts cross-shard (on 2+ hosts: cross-DCN) reshards around every
    scale (measured: tests/test_multihost_aot.py). Pure row permutation:
    per-request results are bitwise identical in every layout."""
    from sdvar_tpu.ops.partition import get_tp_mesh

    mesh = get_tp_mesh()
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get("data", 1))


def cfg_pair(cond: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
    """Stack cond/uncond (B, ...) rows into the (2B, ...) CFG batch in the
    active layout (see _cfg_groups)."""
    assert cond.shape == uncond.shape, (cond.shape, uncond.shape)
    B, tail = cond.shape[0], cond.shape[1:]
    ds = _cfg_groups()
    if ds <= 1 or B % ds:
        return jnp.concatenate([cond, uncond], axis=0)
    s = jnp.stack([cond.reshape((ds, B // ds) + tail),
                   uncond.reshape((ds, B // ds) + tail)], axis=1)
    return s.reshape((2 * B,) + tail)


def cfg_double(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) -> (2B, ...): the shared input map repeated for cond and
    uncond rows (replaces the reference's repeat(2, 1, 1),
    models/var.py:188) in the active layout."""
    return cfg_pair(x, x)


def cfg_halves(y: jnp.ndarray):
    """(2B, ...) -> (cond (B, ...), uncond (B, ...)) in the active layout;
    inverse of cfg_pair."""
    B2, tail = y.shape[0], y.shape[1:]
    B = B2 // 2
    ds = _cfg_groups()
    if ds <= 1 or B % ds:
        return y[:B], y[B:]
    yr = y.reshape((ds, 2, B // ds) + tail)
    return (yr[:, 0].reshape((B,) + tail), yr[:, 1].reshape((B,) + tail))


def cfg_mix(logits_2BlV: jnp.ndarray, t: jnp.ndarray | float) -> jnp.ndarray:
    """Classifier-free guidance mix over a doubled batch:
    (1+t)*cond - t*uncond (reference: models/var.py:199-200). ``t`` may be a
    scalar or a per-token vector (l,) for multi-scale verify windows."""
    cond, uncond = cfg_halves(logits_2BlV)
    if not jnp.isscalar(t) and getattr(t, "ndim", 0) == 1:
        t = t[None, :, None]
    return (1.0 + t) * cond - t * uncond
