"""Mask-builder unit tests (reference: models/var.py:106-113,548-578,777-824)."""

import numpy as np

from sdvar_tpu.ops.masks import (
    block_causal_bias,
    block_only_bias,
    prefill_bias,
    sd_masking_bias,
    verify_window_bias,
)

PNS = (1, 2, 3)
L = sum(p * p for p in PNS)  # 14


def test_block_causal_structure():
    b = block_causal_bias(PNS)
    assert b.shape == (L, L)
    # scale 0 token sees only itself's scale; scale 2 sees everything
    assert np.all(b[0, 1:] == -np.inf) and b[0, 0] == 0
    assert np.all(b[-1, :] == 0)
    # within-scale attention is full (own scale included)
    assert np.all(b[1:5, 1:5] == 0)


def test_sd_masking_restricts_intra_block():
    b = sd_masking_bias(PNS)
    # diagonal always allowed
    assert np.all(np.diag(b) == 0)
    # within scale 1 (tokens 1..4): only self
    assert b[2, 1] == -np.inf and b[1, 2] == -np.inf
    # cross-scale causal still allowed
    assert np.all(b[5:, :1] == 0)
    # future still masked
    assert np.all(b[0, 1:] == -np.inf)


def test_block_only():
    b = block_only_bias(PNS)
    assert np.all(b[1:5, 1:5] == 0)
    assert np.all(b[1:5, 0] == -np.inf)
    assert np.all(b[1:5, 5:] == -np.inf)


def test_prefill_modes():
    assert prefill_bias(PNS, 1, 0) is None
    P = 5  # ed(entry=1) = 1 + 4
    for mode in (1, 2, 3, 4, 5):
        b = prefill_bias(PNS, 1, mode)
        assert b.shape == (P, P), mode
    b2 = prefill_bias(PNS, 1, 2)
    # current rows (scale 1 tokens: 1..4) fully unmasked in mode 2
    assert np.all(b2[1:5, :] == 0)
    b3 = prefill_bias(PNS, 1, 3)
    np.testing.assert_array_equal(b3, block_causal_bias(PNS)[:P, :P])


def test_verify_window_bias():
    # window scales 1..2 (queries 4+9=13), kv covers [0, 14)
    b = verify_window_bias(PNS, 1, 2, L)
    assert b.shape == (13, L)
    # prefix (scale 0, 1 token) fully visible
    assert np.all(b[:, 0] == 0)
    # scale-1 queries cannot see scale-2 keys
    assert np.all(b[:4, 5:] == -np.inf)
    # scale-2 queries see everything
    assert np.all(b[4:, :] == 0)
    # intra-window block-causal: scale-1 queries see scale-1 keys
    assert np.all(b[:4, 1:5] == 0)


def test_mask_family_1024px_schedule():
    """The mask family at the 1024px preset (L=9451, 14 scales) — the
    largest schedule the framework ships (reference: utils/arg_util.py:249).
    Shapes and block invariants only (the full (L, L) train mask is 340 MB
    f32, so spot-check rows instead of materializing twice)."""
    from sdvar_tpu.config import PATCH_NUMS_1024
    from sdvar_tpu.ops.masks import (
        hidden_prefix_decode_bias,
        scale_ids,
    )

    pns = PATCH_NUMS_1024
    L1024 = sum(p * p for p in pns)
    assert L1024 == 9451
    d = scale_ids(pns)
    assert d.shape == (L1024,) and d[-1] == len(pns) - 1

    # verify-window bias for the last two scales (the largest window)
    g = 2
    start = len(pns) - g
    kv = L1024
    b = verify_window_bias(pns, start, g, kv)
    Lq = pns[-2] ** 2 + pns[-1] ** 2
    assert b.shape == (Lq, kv)
    prefix = kv - Lq
    assert np.all(b[:, :prefix] == 0)
    # first window scale cannot see the second
    assert np.all(b[: pns[-2] ** 2, prefix + pns[-2] ** 2:] == -np.inf)

    # prefill bias at a mid handoff point stays block-structured
    entry = 7
    P = int(np.cumsum([p * p for p in pns])[entry])
    pb = prefill_bias(pns, entry, 3)
    assert pb.shape == (P, P)
    # block-causal: first token sees only itself
    assert pb[0, 0] == 0 and np.all(pb[0, 1:] == -np.inf)

    hp = hidden_prefix_decode_bias(pns, len(pns) - 1, 100)
    assert hp.shape == (pns[-1] ** 2, L1024)
    assert np.all(hp[:, :100] == -np.inf) and np.all(hp[:, 100:] == 0)
