"""Sampling-kernel parity and distributional tests
(reference: models/helpers.py:6-36)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.ops.sampling import (
    cfg_mix,
    greedy,
    mask_top_k,
    mask_top_p,
    sample_with_top_k_top_p,
)

torch = pytest.importorskip("torch")


def _torch_mask(logits, top_k, top_p):
    """The reference's in-place masking (models/helpers.py:8-15)."""
    t = torch.from_numpy(logits.copy())
    if top_k > 0:
        idx_to_remove = t < t.topk(top_k, largest=True, sorted=False, dim=-1)[
            0
        ].amin(dim=-1, keepdim=True)
        t.masked_fill_(idx_to_remove, -torch.inf)
    if top_p > 0:
        sorted_logits, sorted_idx = t.sort(dim=-1, descending=False)
        sorted_idx_to_remove = sorted_logits.softmax(dim=-1).cumsum_(dim=-1) <= (
            1 - top_p
        )
        sorted_idx_to_remove[..., -1:] = False
        t.masked_fill_(
            sorted_idx_to_remove.scatter(
                sorted_idx.ndim - 1, sorted_idx, sorted_idx_to_remove
            ),
            -torch.inf,
        )
    return t.numpy()


@pytest.mark.parametrize("top_k,top_p", [(5, 0.0), (0, 0.8), (10, 0.9), (3, 0.5)])
def test_masking_matches_torch(top_k, top_p):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 4, 32)).astype(np.float32) * 3
    ref = _torch_mask(logits, top_k, top_p)
    got = np.asarray(mask_top_p(mask_top_k(jnp.asarray(logits), top_k), top_p))
    # compare the -inf masks and surviving values
    np.testing.assert_array_equal(np.isinf(ref), np.isinf(got))
    m = ~np.isinf(ref)
    np.testing.assert_allclose(ref[m], got[m], rtol=1e-6)


def test_gumbel_sampling_matches_categorical():
    """Gumbel-max over masked logits samples the same distribution as
    torch.multinomial(softmax(masked)) — chi-square sanity check."""
    logits = jnp.asarray([[0.0, 1.0, 2.0, -jnp.inf]])
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    samples = jax.vmap(
        lambda k: sample_with_top_k_top_p(logits[None], k)[0, 0]
    )(keys)
    counts = np.bincount(np.asarray(samples), minlength=4)
    probs = np.exp([0, 1, 2]) / np.exp([0, 1, 2]).sum()
    assert counts[3] == 0
    got = counts[:3] / n
    np.testing.assert_allclose(got, probs, atol=0.03)


@pytest.mark.parametrize("top_k,top_p", [(10, 0.8), (5, 0.5), (20, 0.95)])
def test_fast_topk_domain_path_matches_masked_set(top_k, top_p):
    """The top-k-domain nucleus fast path must admit exactly the same token
    set as the reference-semantics full-vocab masking."""
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.standard_normal((3, 4, 64)).astype(np.float32) * 2)
    slow = np.asarray(mask_top_p(mask_top_k(logits, top_k), top_p))
    allowed_slow = ~np.isinf(slow)

    vals, idxs = jax.lax.top_k(logits, top_k)
    probs = jax.nn.softmax(vals, axis=-1)
    prior = jnp.cumsum(probs, axis=-1) - probs
    keep = np.asarray(prior < top_p)
    allowed_fast = np.zeros(logits.shape, bool)
    idxs_np = np.asarray(idxs)
    for b in range(logits.shape[0]):
        for l in range(logits.shape[1]):
            allowed_fast[b, l, idxs_np[b, l][keep[b, l]]] = True
    np.testing.assert_array_equal(allowed_slow, allowed_fast)


def test_greedy_and_topk1_agree():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 5, 17)).astype(np.float32))
    ids = sample_with_top_k_top_p(logits, jax.random.PRNGKey(0), top_k=1)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(greedy(logits)))


def test_cfg_mix_scalar_and_vector():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((4, 6, 9)).astype(np.float32))
    out_s = cfg_mix(logits, 0.5)
    ref = 1.5 * logits[:2] - 0.5 * logits[2:]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), rtol=1e-6)
    t = jnp.asarray([0.0, 0.1, 0.2, 0.3, 0.4, 0.5])
    out_v = cfg_mix(logits, t)
    ref_v = (1 + t)[None, :, None] * logits[:2] - t[None, :, None] * logits[2:]
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v), rtol=1e-6)


def test_cfg_layout_helpers_roundtrip_all_group_counts(monkeypatch):
    """cfg_pair/cfg_halves are exact inverses and cfg_mix is layout-
    invariant: the shard-local interleaved layout (active under a >1-way
    data mesh) must produce the same mixed logits as the reference's
    global concat layout."""
    import sdvar_tpu.ops.sampling as SMP

    rng = np.random.default_rng(7)
    B = 8
    cond = jnp.asarray(rng.standard_normal((B, 3, 5)).astype(np.float32))
    unc = jnp.asarray(rng.standard_normal((B, 3, 5)).astype(np.float32))
    want = np.asarray(1.5 * cond - 0.5 * unc)
    for ds in (1, 2, 4, 8, 3):  # 3 does not divide B -> concat fallback
        monkeypatch.setattr(SMP, "_cfg_groups", lambda ds=ds: ds)
        y = SMP.cfg_pair(cond, unc)
        assert y.shape == (2 * B, 3, 5)
        c2, u2 = SMP.cfg_halves(y)
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(cond))
        np.testing.assert_array_equal(np.asarray(u2), np.asarray(unc))
        np.testing.assert_allclose(np.asarray(SMP.cfg_mix(y, 0.5)), want,
                                   rtol=1e-6)
        d = SMP.cfg_double(cond)
        dc, du = SMP.cfg_halves(d)
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(du))
