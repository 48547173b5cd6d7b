"""Weight-only int8 quantization (ops/quant.py).

TPU-native serving extension (no reference counterpart — the reference
serves bf16 as-is): verifies the quantized representation slots into the
unchanged model code via nn/core.linear, nn/core.embed and
nn/transformer.lm_logits, and that policy outputs stay close.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.cogact import (
    CogActConfig,
    cogact_inference_action,
    init_cogact,
)
from dexbotic_tpu.models.vlm import VLMConfig, init_vlm, vlm_forward
from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.transformer import TransformerConfig, lm_logits
from dexbotic_tpu.nn.vit import ViTConfig
from dexbotic_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    quantize_params,
    quantize_weight,
    quantized_bytes,
)

LLM = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=8, intermediate_size=64, attn_impl="xla",
)
VIT = ViTConfig(
    image_size=28, patch_size=14, hidden_size=24, num_layers=2, num_heads=4,
    intermediate_size=48, select_layer=None,
)
VLM = VLMConfig(llm=LLM, vit=VIT, projector_type="mlp2x_gelu")


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96), jnp.float32)
    d = quantize_weight(w)
    assert d["q"].dtype == jnp.int8 and d["s"].shape == (1, 96)
    # symmetric rounding: |w - q*s| <= s/2 per element
    err = np.abs(np.asarray(dequantize_weight(d)) - np.asarray(w))
    bound = 0.5 * np.asarray(d["s"], np.float64) + 1e-6
    assert (err <= bound).all()


def test_linear_quantized_close():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = core.linear_init(k1, 64, 96)
    x = jax.random.normal(k2, (4, 64), jnp.float32)
    exact = core.linear(p, x)
    qp = {"w": quantize_weight(p["w"]), "b": p["b"]}
    assert _rel_err(core.linear(qp, x), exact) < 0.02


def test_embed_and_tied_lm_logits_quantized():
    cfg = LLM  # tie_embeddings default path: no lm_head in params
    p = {"embed": core.embed_init(jax.random.PRNGKey(2), cfg.vocab_size, cfg.hidden_size)}
    ids = jnp.asarray([[3, 17, 99], [0, 5, 127]])
    hidden = jax.random.normal(jax.random.PRNGKey(3), (2, 3, cfg.hidden_size), jnp.float32)
    exact_emb = core.embed(p["embed"], ids)
    exact_logits = lm_logits(p, cfg, hidden)

    qp = quantize_params(p, min_size=0)
    assert is_quantized(qp["embed"]["embedding"])
    assert qp["embed"]["embedding"]["s"].shape == (cfg.vocab_size, 1)
    assert _rel_err(core.embed(qp["embed"], ids), exact_emb) < 0.02
    assert _rel_err(lm_logits(qp, cfg, hidden), exact_logits) < 0.02


def test_quantize_params_walk_and_vlm_forward():
    p = init_vlm(jax.random.PRNGKey(0), VLM)
    qp = quantize_params(p, min_size=0)

    # every eligible "w" leaf became {"q","s"}; biases/norms untouched
    qw = qp["llm"]["layers"]["attn"]["q"]["w"]
    assert is_quantized(qw)
    # stacked layers keep the leading layer axis on q and s
    assert qw["q"].ndim == 3 and qw["s"].ndim == 3 and qw["s"].shape[1] == 1
    assert qw["q"].shape[0] == LLM.num_layers
    # norm scales (also {"w"} dicts, 2-D when layer-stacked) are NOT quantized
    assert not is_quantized(qp["llm"]["layers"]["ln1"]["w"])
    assert not is_quantized(qp["llm"]["norm"]["w"])
    assert not is_quantized(qp["vit"]["layers"]["ln1"]["w"])
    assert quantized_bytes(qp) < 0.5 * quantized_bytes(p)

    nt = VLM.num_image_tokens
    ids = np.random.RandomState(0).randint(1, 100, (2, nt + 5))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids)
    valid = jnp.ones(ids.shape, jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 28, 28, 3))
    exact, _ = vlm_forward(p, VLM, ids, valid, images=imgs)
    quant, _ = vlm_forward(qp, VLM, ids, valid, images=imgs)
    assert np.isfinite(np.asarray(quant)).all()
    assert _rel_err(quant, exact) < 0.05


def test_min_size_threshold_skips_small_weights():
    p = init_vlm(jax.random.PRNGKey(0), VLM)
    qp = quantize_params(p)  # default min_size: all tiny weights skipped
    assert jax.tree_util.tree_structure(qp) == jax.tree_util.tree_structure(p)


def test_exp_quantized_inference_single(capsys):
    """Product path: CogActExp(inference_quantize='int8') serves through the
    quantized tree end-to-end (load_for_inference -> jitted infer)."""
    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.cogact_exp import CogActExp, CogActModelConfig

    exp = CogActExp(
        model=CogActModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="DiT-S",
            action_dim=7, chunk_size=4,
        ),
        tokenizer=base_exp.TokenizerConfig(model_max_length=96),
        data=base_exp.DataConfig(image_processor="28", aug_policy="identity"),
        inference_quantize="int8",
        inference_quantize_min_size=0,  # test-scale weights are tiny
    )
    cfg, params, _ = exp.load_for_inference()
    assert any(
        is_quantized(l)
        for l in jax.tree_util.tree_leaves(params, is_leaf=is_quantized)
    )
    actions = exp.inference_single(prompt="stack the bowls")
    assert np.asarray(actions).shape == (4, 7)
    assert np.isfinite(np.asarray(actions)).all()


def test_cogact_inference_quantized_close():
    cfg = CogActConfig(vlm=VLM, action_model_type="DiT-S", action_dim=7, chunk_size=4)
    p = init_cogact(jax.random.PRNGKey(0), cfg)
    nt = VLM.num_image_tokens
    ids = np.random.RandomState(0).randint(1, 100, (2, nt + 5))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids)
    valid = jnp.ones(ids.shape, jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 28, 28, 3))

    exact = cogact_inference_action(p, cfg, ids, valid, imgs, jax.random.PRNGKey(5))
    qp = dict(p, vlm=quantize_params(p["vlm"], min_size=0))
    quant = cogact_inference_action(qp, cfg, ids, valid, imgs, jax.random.PRNGKey(5))
    assert quant.shape == exact.shape and np.isfinite(np.asarray(quant)).all()
    e, q = np.asarray(exact).ravel(), np.asarray(quant).ravel()
    cos = float(np.dot(e, q) / (np.linalg.norm(e) * np.linalg.norm(q)))
    assert cos > 0.99, cos


def test_quant_matmul_kernel_interpret():
    """Pallas int8-weight matmul (interpret mode) == XLA dequant formulation."""
    from dexbotic_tpu.ops.quant_matmul import (
        quant_matmul,
        quant_matmul_eligible,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    M, K, N = 35, 256, 384  # M unaligned (pads to 48); K, N block-divisible
    w = jax.random.normal(k1, (K, N), jnp.float32) * 0.05
    d = quantize_weight(w)
    x = jax.random.normal(k2, (M, K), jnp.float32)
    assert quant_matmul_eligible(M, K, N)
    ref = (x @ d["q"].astype(x.dtype)) * d["s"].astype(x.dtype)
    out = quant_matmul(x, d["q"], d["s"], interpret=True)
    assert out.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_quant_linear_fallback_and_eligibility():
    from dexbotic_tpu.ops.quant_matmul import quant_linear, quant_matmul_eligible

    # indivisible N -> not eligible -> XLA fallback path (still correct)
    assert not quant_matmul_eligible(8, 256, 100)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = {"w": quantize_weight(jax.random.normal(k1, (64, 100)) * 0.05),
         "b": jnp.ones((100,))}
    x = jax.random.normal(k2, (2, 3, 64), jnp.float32)
    out = quant_linear(p, x)
    ref = (x @ p["w"]["q"].astype(x.dtype)) * p["w"]["s"].astype(x.dtype) + 1.0
    assert out.shape == (2, 3, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quant_matmul_padded_weight():
    """Out-dim padding at quantization time (kernel tiling) keeps numerics."""
    from dexbotic_tpu.ops.quant_matmul import quant_linear

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    K, N = 128, 1100  # pads to the next 128 multiple
    w = jax.random.normal(k1, (K, N), jnp.float32) * 0.05
    d = quantize_weight(w, pad_cols=True)
    assert d["q"].shape == (K, 1152) and d["s"].shape == (1, N)
    assert np.asarray(d["q"][:, N:]).max() == 0
    deq = dequantize_weight(d)
    assert deq.shape == (K, N)

    x = jax.random.normal(k2, (9, K), jnp.float32)
    ref = (x @ d["q"][:, :N].astype(x.dtype)) * d["s"].astype(x.dtype)
    out = quant_linear({"w": d}, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_w8a8_matmul_accuracy_and_dispatch():
    """w8a8_matmul: int8 x int8 with dynamic per-row activation scales stays
    within ~1% relative of the fp32 product, and quant_linear dispatches to
    it exactly when M >= W8A8_MIN_ROWS."""
    from dexbotic_tpu.ops import quant_matmul
    from dexbotic_tpu.ops.quant import quantize_weight
    from dexbotic_tpu.ops.quant_matmul import quant_linear, w8a8_matmul

    rs = np.random.RandomState(0)
    x = rs.randn(64, 128).astype(np.float32)
    w = (rs.randn(128, 96) * 0.05).astype(np.float32)
    p = {"w": quantize_weight(jnp.asarray(w))}
    ref = x @ w
    out = np.asarray(w8a8_matmul(jnp.asarray(x), p["w"]["q"], p["w"]["s"]))
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(out - ref) / denom) < 0.02

    old = quant_matmul.W8A8_MIN_ROWS
    try:
        quant_matmul.W8A8_MIN_ROWS = 64
        out_dispatch = np.asarray(quant_linear(p, jnp.asarray(x)))
        np.testing.assert_allclose(out_dispatch, out, rtol=1e-5, atol=1e-5)
        quant_matmul.W8A8_MIN_ROWS = 65  # below threshold -> dequant path
        out_deq = np.asarray(quant_linear(p, jnp.asarray(x)))
        # dequant path has no activation rounding: closer to fp32 ref
        assert np.mean(np.abs(out_deq - ref)) <= np.mean(np.abs(out_dispatch - ref)) + 1e-6
    finally:
        quant_matmul.W8A8_MIN_ROWS = old


def test_w8a8_end_task_action_quality():
    """End-task quality gate for W8A8 batched prefill (TODO round-3): the
    full CogACT frame->chunk program with EVERY eligible matmul forced onto
    the int8-activation path must stay close to the fp32 policy — and the
    extra error vs weight-only int8 must be modest.  This is the proxy this
    environment can measure (success-rate eval needs libero + checkpoints);
    the serving default stays weight-only until real-checkpoint replay
    exists, with W8A8 opt-in (exp inference_quantize="w8a8")."""
    from dexbotic_tpu.ops import quant_matmul

    cfg = CogActConfig(vlm=VLM, action_model_type="DiT-S", action_dim=7, chunk_size=4)
    p = init_cogact(jax.random.PRNGKey(0), cfg)
    nt = VLM.num_image_tokens
    ids = np.random.RandomState(3).randint(1, 100, (2, nt + 5))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    ids = jnp.asarray(ids)
    valid = jnp.ones(ids.shape, jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 28, 28, 3))

    exact = cogact_inference_action(p, cfg, ids, valid, imgs, jax.random.PRNGKey(5))
    qp = dict(p, vlm=quantize_params(p["vlm"], min_size=0))

    old = quant_matmul.W8A8_MIN_ROWS
    try:
        quant_matmul.W8A8_MIN_ROWS = None
        wonly = cogact_inference_action(qp, cfg, ids, valid, imgs, jax.random.PRNGKey(5))
        quant_matmul.W8A8_MIN_ROWS = 1  # force int8 activations everywhere
        w8a8 = cogact_inference_action(qp, cfg, ids, valid, imgs, jax.random.PRNGKey(5))
    finally:
        quant_matmul.W8A8_MIN_ROWS = old

    e = np.asarray(exact).ravel()
    for out in (wonly, w8a8):
        assert np.isfinite(np.asarray(out)).all()
    q8 = np.asarray(w8a8).ravel()
    qw = np.asarray(wonly).ravel()
    cos8 = float(np.dot(e, q8) / (np.linalg.norm(e) * np.linalg.norm(q8)))
    cosw = float(np.dot(e, qw) / (np.linalg.norm(e) * np.linalg.norm(qw)))
    assert cos8 > 0.98, (cos8, cosw)
    # activation rounding may add error on top of weight rounding, but not
    # catastrophically (W8A8 serving runs it only on >=2048-row prefills;
    # here we force it on every matmul incl. tiny DiT steps — worst case)
    assert (1 - cos8) < 8 * max(1 - cosw, 1e-4), (cos8, cosw)


# ---------------------------------------------------------------------------
# W8A8 promotion gate (VERDICT r4 #4).
#
# Policy: batched serving (B>=8 prefill, rows>=W8A8_MIN_ROWS) is promoted to
# W8A8 by default once BOTH hold:
#   (a) this gate passes — per-policy end-task checks with int8 activations
#       forced onto EVERY matmul (W8A8_MIN_ROWS=1), a strictly harder regime
#       than the production dispatch which int8-izes only >=2048-row prefill
#       matmuls and leaves the small sampler/decode matmuls in bf16;
#   (b) real-checkpoint replay confirms success-rate parity (environmentally
#       blocked: no weights/libero here; script/replay_checkpoint.py is the
#       one-command path when they arrive).
# Until (b), bench.py publishes the gated W8A8 number alongside the bf16
# default and cites this gate (see BENCH_NOTES "W8A8 promotion gate").
# Checks per VERDICT r4 #4: action cosine vs fp32 on golden inputs
# (CogACT above, OFT-L1 here), BIT-EXACT bins for OFT-Discrete, trajectory
# error bound for flow policies (pi0).
# ---------------------------------------------------------------------------


def _force_w8a8(fn):
    from dexbotic_tpu.ops import quant_matmul

    old = quant_matmul.W8A8_MIN_ROWS
    quant_matmul.W8A8_MIN_ROWS = 1
    try:
        return fn()
    finally:
        quant_matmul.W8A8_MIN_ROWS = old


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_w8a8_gate_oft_l1_action_cos():
    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_inference_action

    cfg = OFTConfig(vlm=VLM, action_model_type="L1", action_dim=3, chunk_size=4)
    p = init_oft(jax.random.PRNGKey(0), cfg)
    nt = VLM.num_image_tokens
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 100, (2, nt + 8))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    ids, valid = jnp.asarray(ids), jnp.ones((2, nt + 8), jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 28, 28, 3))

    exact = oft_inference_action(p, cfg, ids, valid, imgs)
    qp = dict(p, vlm=quantize_params(p["vlm"], min_size=0))
    w8a8 = _force_w8a8(lambda: oft_inference_action(qp, cfg, ids, valid, imgs))
    assert np.isfinite(np.asarray(w8a8)).all()
    assert _cos(w8a8, exact) > 0.98, _cos(w8a8, exact)


def test_w8a8_gate_oft_discrete_bins_bit_exact():
    """The discrete head's bins must not move AT ALL under W8A8 — a changed
    bin is a changed robot command, so the gate is bit-exactness of the
    argmax decode, not a cosine."""
    from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_inference_action

    cfg = OFTConfig(vlm=VLM, action_model_type="Discrete", action_dim=3, chunk_size=4)
    p = init_oft(jax.random.PRNGKey(0), cfg)
    nt = VLM.num_image_tokens
    rs = np.random.RandomState(1)
    ids = rs.randint(1, 100, (2, nt + 8))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    ids, valid = jnp.asarray(ids), jnp.ones((2, nt + 8), jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 28, 28, 3))

    exact = np.asarray(oft_inference_action(p, cfg, ids, valid, imgs))
    qp = dict(p, vlm=quantize_params(p["vlm"], min_size=0))
    w8a8 = np.asarray(_force_w8a8(lambda: oft_inference_action(qp, cfg, ids, valid, imgs)))
    # continuous values are a deterministic function of the bin index, so
    # exact equality of outputs == bit-exact bins
    np.testing.assert_array_equal(w8a8, exact)


def test_w8a8_gate_pi0_flow_trajectory():
    from dexbotic_tpu.models.flow_vla import (
        flow_vla_inference_action,
        init_flow_vla,
        pi0_config,
    )
    from dexbotic_tpu.models.presets import EXPERT_TEST, LLM_TEST, VIT_TEST

    cfg = pi0_config(LLM_TEST, EXPERT_TEST, VIT_TEST, action_dim=8, chunk_size=5,
                     projector_type="linear")
    p = init_flow_vla(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    B, n_views, text_len = 2, 2, 6
    images = jax.random.normal(ks[0], (B, n_views, 28, 28, 3))
    image_masks = jnp.ones((B, n_views), jnp.int32)
    ids = jax.random.randint(ks[1], (B, text_len), 1, cfg.llm.vocab_size)
    text_mask = jnp.ones((B, text_len), jnp.int32)
    states = jax.random.normal(ks[2], (B, cfg.action_dim))

    exact = flow_vla_inference_action(
        p, cfg, ids, text_mask, images, image_masks, states, ks[3])
    qp = quantize_params(p, min_size=0)
    w8a8 = _force_w8a8(lambda: flow_vla_inference_action(
        qp, cfg, ids, text_mask, images, image_masks, states, ks[3]))
    assert np.isfinite(np.asarray(w8a8)).all()
    # trajectory error bound: the 10-step Euler integration compounds
    # per-step quantization error; require the end trajectory to stay within
    # 5% relative L2 of the fp32 policy and near-parallel
    e, q = np.asarray(exact, np.float64), np.asarray(w8a8, np.float64)
    rel = np.linalg.norm(q - e) / max(np.linalg.norm(e), 1e-12)
    assert rel < 0.05, rel
    assert _cos(w8a8, exact) > 0.99, _cos(w8a8, exact)
