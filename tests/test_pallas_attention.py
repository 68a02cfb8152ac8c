"""Pallas attention kernel parity vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.ops.pallas.attention import pallas_attention

from sdvar_tpu.ops.masks import block_causal_bias, verify_window_bias


def _xla_attention(q, k, v, bias, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[None, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


@pytest.mark.parametrize("Lq,Lk", [(1, 1), (4, 5), (14, 14), (13, 30)])
def test_nobias_parity(Lq, Lk):
    B, H, d = 2, 3, 64
    q, k, v = (_rand((B, L, H, d), i) for i, L in enumerate((Lq, Lk, Lk)))
    ref = _xla_attention(q, k, v, None, 0.125)
    got = pallas_attention(q, k, v, None, 0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_block_causal_bias_parity():
    pns = (1, 2, 3)
    L = 14
    B, H, d = 2, 2, 64
    bias = jnp.asarray(block_causal_bias(pns))
    q, k, v = (_rand((B, L, H, d), 10 + i) for i in range(3))
    ref = _xla_attention(q, k, v, bias, 0.2)
    got = pallas_attention(q, k, v, bias, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_verify_window_bias_parity():
    pns = (1, 2, 3, 4)
    bias = jnp.asarray(verify_window_bias(pns, 1, 2, 14))
    B, H, d = 1, 2, 64
    q = _rand((B, 13, H, d), 20)
    k, v = (_rand((B, 14, H, d), 21 + i) for i in range(2))
    ref = _xla_attention(q, k, v, bias, 1.0)
    got = pallas_attention(q, k, v, bias, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("Lq,Lk,H", [(13, 30, 2), (9, 14, 3)])
def test_token_major_kv_parity(Lq, Lk, H):
    """(Lk, B, H, d) KV layout (KV-cache slices) == batch-major reference."""
    B, d = 2, 64
    q = _rand((B, Lq, H, d), 50)
    k_tm, v_tm = (_rand((Lk, B, H, d), 51 + i) for i in range(2))
    k_bm = jnp.transpose(k_tm, (1, 0, 2, 3))
    v_bm = jnp.transpose(v_tm, (1, 0, 2, 3))
    ref = _xla_attention(q, k_bm, v_bm, None, 0.125)
    got = pallas_attention(q, k_tm, v_tm, None, 0.125, interpret=True,
                           kv_token_major=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("Lq,Lk,H,with_bias", [
    (13, 30, 2, False), (9, 14, 3, False), (13, 30, 2, True),
    (320, 416, 2, False),   # query-blocked path
])
def test_int8_kv_fused_dequant(Lq, Lk, H, with_bias):
    """Fused in-kernel INT8 KV dequant == dequantize-then-attend reference."""
    from sdvar_tpu.ops.quantization import quantize_tokens

    B, d = 2, 64
    q = _rand((B, Lq, H, d), 70)
    k_tm, v_tm = (_rand((Lk, B, H, d), 71 + i) for i in range(2))
    kq, ks = quantize_tokens(k_tm.reshape(Lk, B, H * d))
    vq, vs = quantize_tokens(v_tm.reshape(Lk, B, H * d))
    k_deq = (kq.astype(jnp.float32) * ks[..., None]).reshape(Lk, B, H, d)
    v_deq = (vq.astype(jnp.float32) * vs[..., None]).reshape(Lk, B, H, d)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(np.random.default_rng(7).random((Lq, Lk)) < 0.3,
                     -np.inf, 0.0).astype(np.float32))
    ref = _xla_attention(q, k_deq.transpose(1, 0, 2, 3),
                         v_deq.transpose(1, 0, 2, 3), bias, 0.125)
    got = pallas_attention(
        q, kq.reshape(Lk, B, H, d), vq.reshape(Lk, B, H, d), bias, 0.125,
        interpret=True, kv_token_major=True, kv_scales=(ks, vs))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kv_len,Lq,int8,with_bias", [
    (14, 9, False, False),    # kv_len padded 14->16
    (30, 16, False, True),    # padded 30->32, with additive bias
    (29, 8, True, False),     # int8 + fused scales, padded 29->32
    (40, 8, True, True),
])
def test_full_cache_kernel(kv_len, Lq, int8, with_bias):
    """pallas_attention_cache (scalar-prefetched layer index, in-kernel
    kv_len masking, optional fused INT8 dequant) == slice-then-attend."""
    from sdvar_tpu.ops.pallas.experimental import pallas_attention_cache
    from sdvar_tpu.ops.quantization import quantize_tokens

    depth, Lmax, B, H, d = 3, 48, 2, 2, 64
    li = 1
    q = _rand((B, Lq, H, d), 80)
    if int8:
        kf = _rand((depth, Lmax, B, H * d), 81)
        vf = _rand((depth, Lmax, B, H * d), 82)
        kq, ks = quantize_tokens(kf)   # (depth, Lmax, B, C), (depth, Lmax, B)
        vq, vs = quantize_tokens(vf)
        ck, cv = kq.reshape(depth, Lmax, B, H, d), vq.reshape(depth, Lmax, B, H, d)
        k_deq = (kq.astype(jnp.float32) * ks[..., None])[li, :kv_len]
        v_deq = (vq.astype(jnp.float32) * vs[..., None])[li, :kv_len]
        kv_scales = (ks.transpose(0, 2, 1), vs.transpose(0, 2, 1))
    else:
        ck = _rand((depth, Lmax, B, H, d), 81)
        cv = _rand((depth, Lmax, B, H, d), 82)
        k_deq = ck[li, :kv_len].reshape(kv_len, B, H * d)
        v_deq = cv[li, :kv_len].reshape(kv_len, B, H * d)
        kv_scales = None
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(np.random.default_rng(9).random((Lq, kv_len)) < 0.3,
                     -np.inf, 0.0).astype(np.float32))
    ref = _xla_attention(
        q, k_deq.reshape(kv_len, B, H, d).transpose(1, 0, 2, 3),
        v_deq.reshape(kv_len, B, H, d).transpose(1, 0, 2, 3), bias, 0.125)
    got = pallas_attention_cache(
        q, ck.reshape(depth, Lmax, B, H * d).reshape(depth, Lmax, B, H, d),
        cv, jnp.asarray(li, jnp.int32), kv_len, bias, 0.125,
        kv_scales=kv_scales, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bg,Lq,kv_len,int8,with_bias", [
    (5, 9, 14, False, False),
    (14, 16, 30, False, True),
    (21, 8, 29, True, False),
    (0, 8, 8, True, True),
])
def test_cache_write_kernel(bg, Lq, kv_len, int8, with_bias):
    """pallas_attention_cache_write: in-kernel DMA of the new tokens' KV
    (+scales) into the aliased cache, then attention over [0, kv_len) ==
    update-then-slice-then-attend (VERDICT round-1 item #7)."""
    from sdvar_tpu.ops.pallas.experimental import pallas_attention_cache_write
    from sdvar_tpu.ops.quantization import quantize_tokens

    depth, Lmax, B, H, d = 3, 48, 2, 2, 64
    C = H * d
    li = 1
    q = _rand((B, Lq, H, d), 90)
    knew_f = _rand((Lq, B, C), 91)
    vnew_f = _rand((Lq, B, C), 92)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(np.random.default_rng(9).random((Lq, kv_len)) < 0.3,
                     -np.inf, 0.0).astype(np.float32))
    if int8:
        ckf = _rand((depth, Lmax, B, C), 93)
        cvf = _rand((depth, Lmax, B, C), 94)
        ck, cks_lm = quantize_tokens(ckf)     # values + (depth, Lmax, B)
        cv, cvs_lm = quantize_tokens(cvf)
        cks, cvs = cks_lm.transpose(0, 2, 1), cvs_lm.transpose(0, 2, 1)
        kq, kts = quantize_tokens(knew_f)     # (Lq, B, C), (Lq, B)
        vq, vts = quantize_tokens(vnew_f)
        res = pallas_attention_cache_write(
            q, kq, vq, ck.reshape(depth, Lmax, B, H, d),
            cv.reshape(depth, Lmax, B, H, d),
            jnp.asarray(li, jnp.int32), bg, kv_len, bias, 0.125,
            new_scales=(kts.T, vts.T), cache_scales=(cks, cvs),
            interpret=True)
        assert res is not None
        out, ck2, cv2, cks2, cvs2 = res
        # reference: numpy update, dequant, attend
        ckr, cvr = np.asarray(ck).copy(), np.asarray(cv).copy()
        ckr[li, bg:bg + Lq] = np.asarray(kq)
        cvr[li, bg:bg + Lq] = np.asarray(vq)
        cksr, cvsr = np.asarray(cks).copy(), np.asarray(cvs).copy()
        cksr[li, :, bg:bg + Lq] = np.asarray(kts.T)
        cvsr[li, :, bg:bg + Lq] = np.asarray(vts.T)
        k_deq = ckr[li, :kv_len] * cksr[li].T[:kv_len, :, None]
        v_deq = cvr[li, :kv_len] * cvsr[li].T[:kv_len, :, None]
        np.testing.assert_array_equal(
            np.asarray(ck2).reshape(depth, Lmax, B, C), ckr)
        np.testing.assert_array_equal(np.asarray(cks2), cksr)
        np.testing.assert_array_equal(np.asarray(cvs2), cvsr)
    else:
        ck = _rand((depth, Lmax, B, C), 93)
        cv = _rand((depth, Lmax, B, C), 94)
        res = pallas_attention_cache_write(
            q, knew_f, vnew_f, ck.reshape(depth, Lmax, B, H, d),
            cv.reshape(depth, Lmax, B, H, d),
            jnp.asarray(li, jnp.int32), bg, kv_len, bias, 0.125,
            interpret=True)
        assert res is not None
        out, ck2, cv2 = res
        ckr, cvr = np.asarray(ck).copy(), np.asarray(cv).copy()
        ckr[li, bg:bg + Lq] = np.asarray(knew_f)
        cvr[li, bg:bg + Lq] = np.asarray(vnew_f)
        k_deq, v_deq = ckr[li, :kv_len], cvr[li, :kv_len]
        np.testing.assert_array_equal(
            np.asarray(ck2).reshape(depth, Lmax, B, C), ckr)
        np.testing.assert_array_equal(
            np.asarray(cv2).reshape(depth, Lmax, B, C), cvr)
    ref = _xla_attention(
        q, jnp.asarray(k_deq.reshape(kv_len, B, H, d)).transpose(1, 0, 2, 3),
        jnp.asarray(v_deq.reshape(kv_len, B, H, d)).transpose(1, 0, 2, 3),
        bias, 0.125)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_xla():
    """custom_vjp backward (XLA recompute) == differentiating the XLA path."""
    B, H, d, Lq, Lk = 1, 2, 64, 6, 14
    q, k, v = (_rand((B, L, H, d), 40 + i) for i, L in enumerate((Lq, Lk, Lk)))
    bias = jnp.asarray(block_causal_bias((1, 2, 3))[:Lq, :Lk])

    def loss_p(q, k, v):
        return jnp.sum(
            pallas_attention(q, k, v, bias, 0.125, interpret=True) ** 2
        )

    def loss_x(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias, 0.125) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_inputs():
    B, H, d, Lq, Lk = 2, 2, 64, 9, 30
    q, k, v = (
        _rand((B, L, H, d), 30 + i).astype(jnp.bfloat16)
        for i, L in enumerate((Lq, Lk, Lk))
    )
    ref = _xla_attention(q, k, v, None, 0.125)
    got = pallas_attention(q, k, v, None, 0.125, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(got, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_query_blocking_large_lq():
    # Lq > 256 triggers the q-axis grid blocking (512px-preset shapes)
    B, H, d, Lq, Lk = 1, 2, 64, 320, 400
    q, k, v = (_rand((B, L, H, d), 40 + i) for i, L in enumerate((Lq, Lk, Lk)))
    ref = _xla_attention(q, k, v, None, 0.125)
    got = pallas_attention(q, k, v, None, 0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_query_blocking_with_bias():
    B, H, d, Lq, Lk = 1, 2, 64, 320, 320
    q, k, v = (_rand((B, L, H, d), 50 + i) for i, L in enumerate((Lq, Lk, Lk)))
    bias = jnp.asarray(
        np.where(np.random.default_rng(5).random((Lq, Lk)) < 0.3,
                 -np.inf, 0.0).astype(np.float32))
    ref = _xla_attention(q, k, v, bias, 0.125)
    got = pallas_attention(q, k, v, bias, 0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_query_blocking_token_major():
    B, H, d, Lq, Lk = 2, 2, 64, 320, 416
    q = _rand((B, Lq, H, d), 60)
    k = _rand((Lk, B, H, d), 61)
    v = _rand((Lk, B, H, d), 62)
    ref = _xla_attention(q, k.transpose(1, 0, 2, 3), v.transpose(1, 0, 2, 3),
                         None, 0.125)
    got = pallas_attention(q, k, v, None, 0.125, interpret=True,
                           kv_token_major=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_choose_blocking_vmem_budgets():
    """Blocking chooser respects the measured scoped-VMEM brackets
    (compile-verified on v5e; see _choose_blocking docstring)."""
    from sdvar_tpu.ops.pallas.attention import _choose_blocking

    # proven 512px envelope point stays exactly as measured: hpp=6, blkq=256
    assert _choose_blocking(36, 64, 1024, 2240, 1) == (6, 256)
    # measured-OOM point (1024px d16, Lk=1755 int8) must shrink below 256
    hpp, blkq = _choose_blocking(16, 64, 768, 1760, 1)
    assert hpp * blkq * 1760 * 4 <= 14_000_000
    assert 768 % blkq == 0
    # long-Lk regime: modeled total (scores + double-buffered k/v) <= 11e6
    for Lk, itemsize in ((5360, 1), (9456, 1), (9456, 2)):
        choice = _choose_blocking(16, 64, 2304, Lk, itemsize)
        assert choice is not None, (Lk, itemsize)
        hpp, blkq = choice
        total = hpp * blkq * Lk * 4 + 4 * Lk * hpp * 64 * itemsize
        assert total <= 11_000_000, (Lk, itemsize, total)
        assert 2304 % blkq == 0 and 16 % hpp == 0 and (hpp * 64) % 128 == 0
    # small decode shapes stay unblocked with max heads-per-program
    assert _choose_blocking(30, 64, 64, 680, 2) == (6, 64)


@pytest.mark.parametrize("int8,H", [(True, 16), (False, 8)])
def test_long_lk_blocking_regime_parity(int8, H):
    """Numeric parity for _choose_blocking's Lk > 2240 regime (the 1024px
    envelope, where the scoped-VMEM model also charges the k/v input
    windows — attention.py budget rationale). Previously only the budget
    arithmetic was unit-tested; this runs the kernel at a 1024px-like shape
    in interpret mode against the XLA composition (VERDICT round-2 #6)."""
    from sdvar_tpu.ops.pallas.attention import _choose_blocking

    B, d = 2, 64
    Lq, Lk = 320, 5360
    itemsize = 1 if int8 else 2
    choice = _choose_blocking(H, d, Lq, Lk, itemsize)
    assert choice is not None, "expected the long-Lk kernel regime to engage"
    hpp, blkq = choice
    assert blkq < Lq, (hpp, blkq)  # genuinely query-blocked (budget path)

    q = _rand((B, Lq, H, d), 90)
    k_tm, v_tm = (_rand((Lk, B, H, d), 91 + i) for i in range(2))
    if int8:
        from sdvar_tpu.ops.quantization import quantize_tokens

        kq, ks = quantize_tokens(k_tm.reshape(Lk, B, H * d))
        vq, vs = quantize_tokens(v_tm.reshape(Lk, B, H * d))
        k_deq = (kq.astype(jnp.float32) * ks[..., None]).reshape(Lk, B, H, d)
        v_deq = (vq.astype(jnp.float32) * vs[..., None]).reshape(Lk, B, H, d)
        ref = _xla_attention(q, k_deq.transpose(1, 0, 2, 3),
                             v_deq.transpose(1, 0, 2, 3), None, 0.125)
        got = pallas_attention(
            q, kq.reshape(Lk, B, H, d), vq.reshape(Lk, B, H, d), None,
            0.125, interpret=True, kv_token_major=True, kv_scales=(ks, vs))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-4)
    else:
        k_bm = jnp.transpose(k_tm, (1, 0, 2, 3))
        v_bm = jnp.transpose(v_tm, (1, 0, 2, 3))
        ref = _xla_attention(q, k_bm, v_bm, None, 0.125)
        got = pallas_attention(q, k_tm, v_tm, None, 0.125, interpret=True,
                               kv_token_major=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_bias,chunk", [(False, 16), (True, 16),
                                              (True, 24)])
def test_chunked_backward_matches_whole_tensor(with_bias, chunk):
    """The flash-style chunked backward (scan over query chunks with score
    recomputation — the long-L training path) must match the whole-tensor
    VJP it replaces."""
    from sdvar_tpu.ops.pallas.attention import (
        pallas_attention,
        set_attention_bwd_chunk,
    )

    B, Lq, Lk, H, d = 2, 64, 80, 2, 64
    q, k, v = (_rand((B, L, H, d), 100 + i)
               for i, L in enumerate((Lq, Lk, Lk)))
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(np.random.default_rng(5).random((Lq, Lk)) < 0.3,
                     -np.inf, 0.0).astype(np.float32))
    g = _rand((B, Lq, H, d), 104)

    def loss(q, k, v):
        out = pallas_attention(q, k, v, bias, 0.125, interpret=True)
        return jnp.sum(out * g)

    try:
        set_attention_bwd_chunk(0)      # whole-tensor VJP
        ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        set_attention_bwd_chunk(chunk)  # 16 = exact; 24 = ragged (pad 8)
        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        set_attention_bwd_chunk(None)
    for r, t in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-5, atol=2e-5)


def test_chunked_backward_bias_grad():
    """dbias (summed over batch/heads) from the chunked path == autodiff of
    the XLA composition."""
    from sdvar_tpu.ops.pallas.attention import (
        _xla_attention,
        pallas_attention,
        set_attention_bwd_chunk,
    )

    B, Lq, Lk, H, d = 2, 32, 40, 2, 64
    q, k, v = (_rand((B, L, H, d), 110 + i)
               for i, L in enumerate((Lq, Lk, Lk)))
    bias = _rand((Lq, Lk), 113) * 0.1
    g = _rand((B, Lq, H, d), 114)

    ref = jax.grad(
        lambda b: jnp.sum(_xla_attention(q, k, v, b, 0.125, False) * g)
    )(bias)
    try:
        set_attention_bwd_chunk(8)
        got = jax.grad(
            lambda b: jnp.sum(
                pallas_attention(q, k, v, b, 0.125, interpret=True) * g)
        )(bias)
    finally:
        set_attention_bwd_chunk(None)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-5)


def test_auto_chunking_engages_beyond_256px_envelope():
    from sdvar_tpu.ops.pallas.attention import _bwd_chunk_for

    assert _bwd_chunk_for(680, 680) == 0       # 256px: whole-tensor VJP
    assert _bwd_chunk_for(2240, 2240) == 224   # 512px: exact divisor
    # 1024px schedule total 9451 = 13*727 has no usable divisor: the
    # backward pads to 256-chunks (inert rows)
    assert _bwd_chunk_for(9451, 9451) == 256


def test_choose_blocking_bias_budget():
    """Training attention carries a (blkq, Lk) f32 bias block: at 512px
    full-sequence shapes the bias-free pick (6, 224) measured a scoped-VMEM
    overflow (18.63M > 16M); with has_bias the stack+bias total is budgeted
    and blkq shrinks."""
    from sdvar_tpu.ops.pallas.attention import _choose_blocking

    # 512px d36 training: Lq = Lk = 2240, bias
    hpp, blkq = _choose_blocking(36, 64, 2240, 2240, 2, has_bias=True)
    assert (hpp, blkq) == (6, 160)
    assert hpp * blkq * 2240 * 4 + 2 * blkq * 2240 * 4 <= 12_500_000
    # bias-free decode at the same shape keeps the measured envelope pick
    assert _choose_blocking(36, 64, 2240, 2240, 2) == (6, 224)
    # 256px training (d30, Lq=Lk=680 + bias) is comfortably inside: the
    # pick must NOT change vs bias-free
    assert _choose_blocking(30, 64, 680, 680, 2, has_bias=True) \
        == _choose_blocking(30, 64, 680, 680, 2)
