"""INT8 weight-only + INT8 KV cache tests (BASELINE.json config #3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdvar_tpu.config import SamplingConfig, VARConfig, VQVAEConfig
from sdvar_tpu.engine.decode import decode_all_scales
from sdvar_tpu.models.quantizer import init_quantizer_params
from sdvar_tpu.models.var import init_var_params, var_train_forward
from sdvar_tpu.ops.quantization import (
    QuantizedLinear,
    dequantize_tokens,
    dequantize_weight,
    quantize_tokens,
    quantize_var_params,
    quantize_weight,
)

PNS = (1, 2, 3, 4)


def test_weight_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    qw = quantize_weight(w)
    deq = dequantize_weight(qw, jnp.float32)
    err = np.abs(np.asarray(w - deq))
    bound = np.asarray(qw.scale)[None, :] * 0.5 + 1e-6
    assert np.all(err <= bound)


def test_fp8_weight_roundtrip_error_bound():
    """e4m3 storage: relative error per element bounded by the 3-bit
    mantissa step (2^-4 of the value's binade) plus the channel scale."""
    from sdvar_tpu.ops.quantization import FP8Linear, quantize_weight_fp8

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    qw = quantize_weight_fp8(w)
    assert isinstance(qw, FP8Linear) and qw.q.dtype == jnp.float8_e4m3fn
    deq = dequantize_weight(qw, jnp.float32)
    err = np.abs(np.asarray(w - deq))
    # e4m3 round-off <= 2^-4 relative for normal values; subnormal floor
    # is scale * 2^-9
    bound = np.abs(np.asarray(w)) * (2.0 ** -4) \
        + np.asarray(qw.scale)[None, :] * (2.0 ** -9) + 1e-7
    assert np.all(err <= bound), err.max()


def test_fp8_forward_and_decode(stack_fp8_placeholder=None):
    """fp8 params run the same forward/decode code paths as w8 with close
    numerics (north star: 'INT8/FP8')."""
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, attn_l2_norm=True,
                        cond_drop_rate=0.0, drop_path_rate=0.0, head_dim=32)
    key = jax.random.PRNGKey(3)
    params = init_var_params(var_cfg, key)
    params["head"]["w"] = params["head"]["w"] * 30.0
    quant = init_quantizer_params(vae_cfg, key, eini=1.0)

    qparams = quantize_var_params(params, mode="fp8")
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (2, var_cfg.L - 1, var_cfg.Cvae))
    lbl = jnp.array([1, 2])
    ref = np.asarray(var_train_forward(var_cfg, params, lbl, x))
    got = np.asarray(var_train_forward(var_cfg, qparams, lbl, x))
    assert np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9) < 0.05

    f32 = decode_all_scales(var_cfg, vae_cfg, params, quant, lbl,
                            jax.random.PRNGKey(7),
                            SamplingConfig(cfg=1.5, top_k=1), jnp.float32,
                            return_ids=True)[1]
    fp8 = decode_all_scales(var_cfg, vae_cfg, qparams, quant, lbl,
                            jax.random.PRNGKey(7),
                            SamplingConfig(cfg=1.5, top_k=1), jnp.float32,
                            return_ids=True)[1]
    agree = float(np.mean(np.asarray(f32) == np.asarray(fp8)))
    assert agree >= 0.8, agree


def test_token_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32) * 3)
    q, s = quantize_tokens(x)
    deq = dequantize_tokens(q, s, jnp.float32)
    rel = np.abs(np.asarray(deq - x)) / (np.abs(np.asarray(x)).max())
    assert rel.max() < 0.01


@pytest.fixture(scope="module")
def stack():
    vae_cfg = VQVAEConfig(vocab_size=64, z_channels=8, ch=32, patch_nums=PNS)
    var_cfg = VARConfig(depth=2, num_classes=10, patch_nums=PNS,
                        vocab_size=64, Cvae=8, attn_l2_norm=True,
                        cond_drop_rate=0.0, drop_path_rate=0.0, head_dim=32)
    key = jax.random.PRNGKey(3)
    params = init_var_params(var_cfg, key)
    params["head"]["w"] = params["head"]["w"] * 30.0
    quant = init_quantizer_params(vae_cfg, key, eini=1.0)
    return vae_cfg, var_cfg, params, quant


def test_quantized_forward_close(stack):
    vae_cfg, var_cfg, params, _ = stack
    qparams = quantize_var_params(params)
    assert isinstance(qparams["blocks"]["qkv_w"], QuantizedLinear)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, var_cfg.L - 1, var_cfg.Cvae)).astype(np.float32)
    label = jnp.array([1, 2])
    fp = np.asarray(var_train_forward(var_cfg, params, label, x))
    q8 = np.asarray(var_train_forward(var_cfg, qparams, label, x))
    # int8 weight error is small relative to logit scale
    denom = np.abs(fp).max()
    assert np.abs(fp - q8).max() / denom < 0.05
    # top-1 predictions overwhelmingly agree
    agree = (fp.argmax(-1) == q8.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_int8_kv_decode_matches_bf16_greedy(stack):
    vae_cfg, var_cfg, params, quant = stack
    label = jnp.array([4, 7])
    samp = SamplingConfig(cfg=1.5, top_k=1)
    key = jax.random.PRNGKey(11)
    fp_fhat, fp_ids = decode_all_scales(
        var_cfg, vae_cfg, params, quant, label, key, samp, jnp.float32,
        return_ids=True,
    )
    q_fhat, q_ids = decode_all_scales(
        var_cfg, vae_cfg, params, quant, label, key, samp, jnp.float32,
        return_ids=True, kv_mode="int8",
    )
    agree = (np.asarray(fp_ids) == np.asarray(q_ids)).mean()
    assert agree > 0.9, agree


def test_quantized_weights_plus_int8_kv_runs(stack):
    vae_cfg, var_cfg, params, quant = stack
    qparams = quantize_var_params(params)
    f_hat = decode_all_scales(
        var_cfg, vae_cfg, qparams, quant, jnp.array([0]),
        jax.random.PRNGKey(0), SamplingConfig(cfg=1.5, top_k=4), jnp.float32,
        kv_mode="int8",
    )
    assert np.isfinite(np.asarray(f_hat)).all()


def test_w8a8_matmul_matches_exact_int8_reference():
    from sdvar_tpu.ops.quantization import (
        W8A8Linear, linear_blc, quantize_activation, quantize_weight,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.05)
    qw = W8A8Linear(*quantize_weight(w))
    out = np.asarray(linear_blc(x, qw, jnp.float32))
    # exact f32 reference of the same quantized computation
    xq, xs = quantize_activation(x)
    ref = (
        jnp.einsum("blk,kn->bln", xq.astype(jnp.float32),
                   qw.q.astype(jnp.float32))
        * xs * qw.scale[None, None, :]
    )
    ref = np.asarray(ref)
    # only f32-vs-exact accumulation order differs
    assert np.abs(out - ref).max() <= 1e-3 * np.abs(ref).max()


def test_w8a8_forward_close(stack):
    vae_cfg, var_cfg, params, _ = stack
    qparams = quantize_var_params(params, mode="w8a8")
    from sdvar_tpu.ops.quantization import QuantizedLinear, W8A8Linear

    assert isinstance(qparams["blocks"]["qkv_w"], W8A8Linear)
    assert isinstance(qparams["blocks"]["ada_lin_w"], QuantizedLinear)
    assert isinstance(qparams["head"]["w"], QuantizedLinear)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, var_cfg.L - 1, var_cfg.Cvae)).astype(np.float32)
    label = jnp.array([3, 9])
    fp = np.asarray(var_train_forward(var_cfg, params, label, x))
    q8 = np.asarray(var_train_forward(var_cfg, qparams, label, x))
    denom = np.abs(fp).max()
    assert np.abs(fp - q8).max() / denom < 0.08
    agree = (fp.argmax(-1) == q8.argmax(-1)).mean()
    assert agree > 0.85, agree
    # per-position logit vectors stay well aligned
    cos = (fp * q8).sum(-1) / (
        np.linalg.norm(fp, axis=-1) * np.linalg.norm(q8, axis=-1) + 1e-9
    )
    assert cos.min() > 0.98, cos.min()


def test_w8a8_decode_runs(stack):
    vae_cfg, var_cfg, params, quant = stack
    qparams = quantize_var_params(params, mode="w8a8")
    f_hat = decode_all_scales(
        var_cfg, vae_cfg, qparams, quant, jnp.array([5]),
        jax.random.PRNGKey(2), SamplingConfig(cfg=1.5, top_k=4), jnp.float32,
        kv_mode="int8",
    )
    assert np.isfinite(np.asarray(f_hat)).all()


def test_act_quantize_kernel_matches_reference():
    """Fused bias+GELU+per-token-quant kernel (ops/pallas/quantize.py) vs
    the XLA semantics it replaces: scales within divide-lowering ULP noise
    (the VPU divide is reciprocal-based), quantized values within +-1 on a
    vanishing fraction of elements."""
    from sdvar_tpu.ops.pallas.quantize import act_quantize, eligible
    from sdvar_tpu.ops.quantization import quantize_activation

    key = jax.random.PRNGKey(0)
    for (B, L, K), gelu in [((4, 64, 512), True), ((2, 128, 1280), True),
                            ((8, 32, 768), False)]:
        x = (jax.random.normal(key, (B, L, K), jnp.float32) * 3).astype(
            jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (K,), jnp.float32)
        assert eligible(x), (B, L, K)
        assert not eligible(x, min_rows=10**6)
        q, s = act_quantize(x, b if gelu else None, gelu=gelu, interpret=True)
        h = x.astype(jnp.float32)
        if gelu:
            h = h + b[None, None, :]
            h = 0.5 * h * (1 + jnp.tanh(0.7978845608028654
                                        * (h + 0.044715 * h ** 3)))
        qr, sr = quantize_activation(h)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=3e-7)
        d = np.abs(np.asarray(q, np.int32) - np.asarray(qr, np.int32))
        assert d.max() <= 1, d.max()
        assert (d != 0).mean() < 1e-3, (d != 0).mean()


def test_ffn_fused_act_quant_matches_xla_path():
    """models/var._ffn with the fused Pallas act-quant + exact s8 dot vs
    the default XLA W8A8 path: same quantized computation up to scale-ULP
    and accumulation-order noise."""
    from sdvar_tpu.models import var as V
    from sdvar_tpu.ops.partition import set_pallas_interpret
    from sdvar_tpu.ops.quantization import (
        W8A8Linear, quantize_weight, set_fused_act_quant,
    )
    import sdvar_tpu.ops.pallas.quantize as plq

    C, hidden = 256, 1024
    rng = np.random.default_rng(7)
    layer = {
        "fc1_w": W8A8Linear(*quantize_weight(jnp.asarray(
            rng.standard_normal((C, hidden)).astype(np.float32) * 0.05))),
        "fc1_b": jnp.asarray(rng.standard_normal(hidden).astype(np.float32)),
        "fc2_w": W8A8Linear(*quantize_weight(jnp.asarray(
            rng.standard_normal((hidden, C)).astype(np.float32) * 0.05))),
        "fc2_b": jnp.asarray(rng.standard_normal(C).astype(np.float32)),
    }
    # M = 2*2048 = 4096 rows passes the MIN_FUSED_ROWS profitability gate
    x = jnp.asarray(rng.standard_normal((2, 2048, C)).astype(np.float32))
    cfg = VARConfig(depth=2, patch_nums=PNS)
    ref = np.asarray(V._ffn(cfg, layer, x))

    calls = []
    orig = plq.act_quantize

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    plq.act_quantize = spy
    set_pallas_interpret(True)
    set_fused_act_quant(True)
    try:
        fused = np.asarray(V._ffn(cfg, layer, x))
    finally:
        plq.act_quantize = orig
        set_pallas_interpret(False)
    assert calls == [(2, 2048, hidden)], calls
    assert np.abs(fused - ref).max() <= 0.02 * np.abs(ref).max() + 1e-6
    # below the row gate the fused branch must fall back to the XLA path
    calls2 = []
    plq.act_quantize = spy if False else orig  # keep orig; count via spy2

    def spy2(*a, **kw):
        calls2.append(a[0].shape)
        return orig(*a, **kw)

    plq.act_quantize = spy2
    set_pallas_interpret(True)
    try:
        small = np.asarray(V._ffn(cfg, layer, x[:, :512]))
    finally:
        plq.act_quantize = orig
        set_pallas_interpret(False)
    assert calls2 == [], calls2
    assert np.isfinite(small).all()
