"""Device mesh + sharding rules: the TPU-native replacement for the
reference's NCCL wrapper (reference: dist.py) and DDP (train.py:102).

Design (SURVEY.md §5.8): a 2-D ``Mesh(("data", "model"))``. Data parallelism
shards the batch axis (gradient psum is implicit in the compiled backward —
no DDP hooks); tensor parallelism shards attention heads, FFN hidden, the
AdaLN projections' output channels, and the vocab head across "model".
The per-scale KV cache is sharded over batch and heads. On hardware, lay the
"model" axis over ICI within a slice and "data" across hosts/DCN.

A 1-device mesh makes every annotation a no-op — the analogue of the
reference's "not initialized -> collectives no-op" behavior (dist.py:97-119).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdvar_tpu.config import MeshConfig, VARConfig

DATA, MODEL = "data", "model"


def create_mesh(cfg: MeshConfig | None = None,
                devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=1, model=len(devices))
    n = cfg.data * cfg.model
    assert n <= len(devices), (cfg, len(devices))
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, (DATA, MODEL))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA, MODEL))


def var_param_specs(cfg: VARConfig) -> dict:
    """PartitionSpec pytree for VAR params (tensor parallel over "model").

    Megatron-style: qkv/fc1 split output columns (heads / hidden), proj/fc2
    split input rows, head splits the vocab. The AdaLN projections — ~1/3 of
    VAR's parameters at d30 — split their 6C output; GSPMD all-gathers the
    small (B, 6C) modulation vector. Embeddings/positions are replicated.
    """
    blocks = {
        "qkv_w": P(None, None, MODEL),
        "q_bias": P(None, MODEL),
        "v_bias": P(None, MODEL),
        "proj_w": P(None, MODEL, None),
        "proj_b": P(None, None),
        "fc1_w": P(None, None, MODEL),
        "fc1_b": P(None, MODEL),
        "fc2_w": P(None, MODEL, None),
        "fc2_b": P(None, None),
    }
    if cfg.attn_l2_norm:
        blocks["scale_mul"] = P(None, None)
    if cfg.shared_aln:
        blocks["ada_gss"] = P(None, None, None, None)
    else:
        blocks["ada_lin_w"] = P(None, None, MODEL)
        blocks["ada_lin_b"] = P(None, MODEL)
    specs = {
        "word_embed": {"w": P(None, None), "b": P(None)},
        "class_emb": P(None, None),
        "pos_start": P(None, None),
        "pos_1LC": P(None, None),
        "lvl_embed": P(None, None),
        "blocks": blocks,
        "head_nm": {"w": P(None, None), "b": P(None)},
        "head": {"w": P(None, MODEL), "b": P(MODEL)},
    }
    if cfg.shared_aln:
        specs["shared_ada_lin"] = {"w": P(None, MODEL), "b": P(MODEL)}
    return specs


def kv_cache_specs() -> "P":
    """KVCache (depth, L, B, H*hd): batch over data, merged heads over
    model."""
    return P(None, None, DATA, MODEL)


def place_kv_cache(cache, mesh: Mesh):
    """Commit a freshly created KV cache to its mesh shardings BEFORE the
    first jitted decode sees it. Without this the first call compiles for
    the uncommitted host-created buffers and the second call — fed the
    previous call's committed outputs — recompiles the whole decode
    (measured: an ~18 s recompile stall in mesh-mode serving's second
    batch). Handles both KVCache (k, v) and QuantizedKVCache
    (k, v, k_s, v_s — scale planes are (depth, B, L): batch over data)."""
    kv = NamedSharding(mesh, kv_cache_specs())
    sc = NamedSharding(mesh, P(None, DATA, None))
    fields = cache._asdict()
    out = {}
    for name, a in fields.items():
        out[name] = jax.device_put(a, sc if name.endswith("_s") else kv)
    return type(cache)(**out)


def replicated_specs(tree) -> dict:
    return jax.tree.map(lambda _: P(), tree)


def batch_spec() -> P:
    return P(DATA)


def shard_tree(tree, specs, mesh: Mesh):
    """Place a pytree on the mesh according to a matching spec tree.

    Quantized weight leaves (QuantizedLinear/W8A8Linear/FP8Linear — the
    (q, scale) pairs ops/quantization produces) are placed against the
    PLAIN weight's spec: ``q`` (same shape as the original weight) takes it
    verbatim; the per-output-channel ``scale`` takes the spec with the
    contraction (input) axis dropped — e.g. qkv_w (depth, in, out) with
    P(None, None, "model") gives scale (depth, out) P(None, "model"), and
    row-sharded proj_w/fc2_w leave the scale replicated. This is what lets
    the W8A8 serving path run tensor-parallel (mesh + quantized weights)."""
    from sdvar_tpu.ops.quantization import (
        FP8Linear,
        QuantizedLinear,
        W8A8Linear,
    )

    qtypes = (QuantizedLinear, W8A8Linear, FP8Linear)

    def place(a, s):
        if isinstance(a, qtypes):
            parts = list(s) + [None] * (a.q.ndim - len(tuple(s)))
            if a.q.ndim == 3:
                sspec = P(parts[0], parts[2])
            else:
                sspec = P(parts[1])
            return type(a)(
                q=jax.device_put(a.q, NamedSharding(mesh, s)),
                scale=jax.device_put(a.scale, NamedSharding(mesh, sspec)),
            )
        return jax.device_put(a, NamedSharding(mesh, s))

    return jax.tree.map(
        place, tree, specs,
        is_leaf=lambda x: isinstance(x, qtypes + (P,)),
    )


def shard_batch(mesh: Mesh, arr, spec: Optional[P] = None):
    """Assemble a process-local batch shard into a global data-sharded array.

    Single-process: a plain device_put. Multi-process: each process holds its
    own contiguous slice of the global batch (the sampler's per-rank slice,
    reference utils/data_sampler.py:96-100) and
    ``make_array_from_process_local_data`` stitches them into one global
    array without any cross-host transfer.
    """
    spec = spec if spec is not None else P(DATA)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() <= 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))
