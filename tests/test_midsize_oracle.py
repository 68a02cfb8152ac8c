"""Mid-size seeded oracle on the FULL 680-token 256px schedule.

Real model-zoo checkpoints cannot be downloaded in this environment (zero
egress — documented in BENCHMARKS.md), so this module is the strongest
available proxy (VERDICT round-1 item #2): a depth-6 target + depth-4 draft
REFERENCE VAR pair (torch CPU, random seeded weights) on the full
PATCH_NUMS_256 schedule, weights ported through utils/torch_port, then:

  - golden greedy baseline decode vs ``autoregressive_infer_cfg``;
  - golden greedy static handoff vs the reference's REAL
    ``sdvar_autoregressive_infer_cfg_sd_test3`` for every sd_mask 0..5
    with a genuinely different draft (models/var.py:604-865);
  - γ ∈ {1,2,3} speculative self-draft bit-parity vs baseline at full L;
  - w8 / w8a8 / INT8-KV quantization token agreement at full L.

The reference hard-codes the 680-token start/exit points
(models/var.py:733-734) and its SDVAR masks assume the 256px schedule
(models/var.py:548), so full-schedule is the only valid oracle setting.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdvar_tpu.config import (  # noqa: E402
    PATCH_NUMS_256,
    SamplingConfig,
    SpeculativeConfig,
    VARConfig,
    VQVAEConfig,
)
from sdvar_tpu.engine.decode import decode_all_scales, generate_images  # noqa: E402
from sdvar_tpu.engine.speculative import SpeculativeEngine  # noqa: E402

PNS = PATCH_NUMS_256
V, CVAE = 512, 16
GREEDY = SamplingConfig(cfg=1.5, top_k=1)


@pytest.fixture(scope="module")
def stack():
    from models.var import VAR
    from models.vqvae import VQVAE

    from sdvar_tpu.utils.torch_port import (
        var_params_from_torch,
        vqvae_params_from_torch,
    )

    torch.manual_seed(1234)
    vae = VQVAE(vocab_size=V, z_channels=CVAE, ch=32, test_mode=True,
                v_patch_nums=PNS)
    with torch.no_grad():
        vae.quantize.embedding.weight.normal_(0, 1.0)

    def mk(depth, seed):
        torch.manual_seed(seed)
        m = VAR(
            vae_local=vae, num_classes=10, depth=depth,
            embed_dim=depth * 32, num_heads=depth, attn_l2_norm=True,
            patch_nums=PNS, cond_drop_rate=0.0,
            flash_if_available=False, fused_if_available=False,
            drop_path_rate=0.0,
        ).eval()
        with torch.no_grad():  # separate the argmax (ctor head is ~0)
            m.head.weight.normal_(0, 0.05)
            m.head.bias.normal_(0, 0.05)
        cfg = VARConfig(
            depth=depth, num_classes=10, patch_nums=PNS, vocab_size=V,
            Cvae=CVAE, attn_l2_norm=True, cond_drop_rate=0.0,
            drop_path_rate=0.0, head_dim=32,
        )
        return m, cfg, var_params_from_torch(cfg, m.state_dict())

    ref_target, target_cfg, target_params = mk(6, 7)
    ref_draft, draft_cfg, draft_params = mk(4, 8)
    vae_cfg = VQVAEConfig(vocab_size=V, z_channels=CVAE, ch=32,
                          patch_nums=PNS)
    vae_params = vqvae_params_from_torch(vae_cfg, vae.state_dict())
    eng = SpeculativeEngine(
        vae_cfg, draft_cfg, target_cfg, vae_params, draft_params,
        target_params, dtype=jnp.float32,
    )
    return dict(
        vae=vae, ref_target=ref_target, ref_draft=ref_draft,
        vae_cfg=vae_cfg, target_cfg=target_cfg, draft_cfg=draft_cfg,
        vae_params=vae_params, target_params=target_params,
        draft_params=draft_params, eng=eng,
    )


@pytest.fixture()
def cpu_to_patch(monkeypatch):
    """The reference sd_test3 hard-codes ``torch.device("cuda:0")`` for its
    attn biases (models/var.py:737,781-798); on CPU-only torch we let the
    failed transfer fall through to the original tensor."""
    orig = torch.Tensor.to

    def safe_to(self, *a, **kw):
        try:
            return orig(self, *a, **kw)
        except (RuntimeError, AssertionError):
            return self

    monkeypatch.setattr(torch.Tensor, "to", safe_to)


def test_fullschedule_greedy_decode_matches_reference(stack):
    label = np.array([3, 7], dtype=np.int64)
    with torch.no_grad():
        ref_img = stack["ref_target"].autoregressive_infer_cfg(
            B=2, label_B=torch.from_numpy(label), cfg=1.5, top_k=1, top_p=0.0,
        ).numpy()
    got = np.asarray(generate_images(
        stack["target_cfg"], stack["vae_cfg"], stack["target_params"],
        stack["vae_params"], jnp.asarray(label), jax.random.PRNGKey(0),
        GREEDY, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(ref_img, got, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("sd_mask", [0, 1, 2, 3, 4, 5])
def test_sd_test3_handoff_matches_reference(stack, cpu_to_patch, sd_mask):
    """Greedy distinct-draft handoff vs the reference's committed sd_test3
    for every mask mode — draft phase, hub re-embedding, masked prefill and
    target continuation all compared end-to-end at full L."""
    label = np.array([5], dtype=np.int64)
    with torch.no_grad():
        from models.var import SDVAR

        sd = SDVAR(stack["ref_draft"], stack["ref_target"])
        ref_img = sd.sdvar_autoregressive_infer_cfg_sd_test3(
            B=1, label_B=torch.from_numpy(label), cfg=1.5, top_k=1,
            top_p=0.0, entry_num=4, sd_mask=sd_mask,
        ).numpy()
    f_hat, _ = stack["eng"].generate_handoff(
        jnp.asarray(label), jax.random.PRNGKey(0), entry_num=4,
        sd_mask=sd_mask, samp=GREEDY, ref_quirks=True,
    )
    got = np.asarray(stack["eng"].decode_image(f_hat))
    np.testing.assert_allclose(ref_img, got, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("gamma", [1, 2, 3])
def test_gamma_selfdraft_bitparity_fullschedule(stack, gamma):
    vae_cfg, cfg = stack["vae_cfg"], stack["target_cfg"]
    eng = SpeculativeEngine(
        vae_cfg, cfg, cfg, stack["vae_params"], stack["target_params"],
        stack["target_params"], dtype=jnp.float32,
    )
    label = jnp.array([2])
    key = jax.random.PRNGKey(3)
    f_hat, stats = eng.generate_speculative(
        label, key, SpeculativeConfig(gamma=gamma), GREEDY
    )
    assert stats.accept_count == len(PNS)
    assert stats.target_calls == -(-len(PNS) // gamma)
    base = decode_all_scales(
        cfg, vae_cfg, stack["target_params"], stack["vae_params"]["quant"],
        label, jax.random.fold_in(key, 1), GREEDY, jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(f_hat), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,kv", [("w8", "bf16"), ("w8a8", "bf16"),
                                     ("w8", "int8"), ("fp8", "bf16")])
def test_quant_token_agreement_fullschedule(stack, mode, kv):
    """Quantized decode must track the f32 decode's tokens at full L
    (BASELINE config #3 quality gate; thresholds follow the measured
    benchmark_cli quant probe)."""
    from sdvar_tpu.ops.quantization import quantize_var_params

    vae_cfg, cfg = stack["vae_cfg"], stack["target_cfg"]
    label = jnp.array([3, 7])
    key = jax.random.PRNGKey(5)
    _, ids_ref = decode_all_scales(
        cfg, vae_cfg, stack["target_params"], stack["vae_params"]["quant"],
        label, key, GREEDY, jnp.float32, return_ids=True,
    )
    qparams = quantize_var_params(stack["target_params"], mode=mode)
    _, ids_q = decode_all_scales(
        cfg, vae_cfg, qparams, stack["vae_params"]["quant"],
        label, key, GREEDY, jnp.float32, kv_mode=kv, return_ids=True,
    )
    agree = float(np.mean(np.asarray(ids_ref) == np.asarray(ids_q)))
    assert agree >= 0.80, (mode, kv, agree)
    # scale 0 (the 1-token root) must agree exactly
    assert np.array_equal(np.asarray(ids_ref)[:, 0], np.asarray(ids_q)[:, 0])
