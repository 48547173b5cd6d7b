import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.oft import (
    OFTConfig,
    bins_to_continuous,
    continuous_to_bins,
    init_oft,
    oft_action_log_probs,
    oft_generate_action,
    oft_inference_action,
    oft_loss,
)
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig

VLM = VLMConfig(llm=LLM_TEST, vit=VIT_TEST, projector_type="mlp2x_gelu")


def _cfg(head, **kw):
    return OFTConfig(vlm=VLM, action_model_type=head, action_dim=3, chunk_size=4, **kw)


def _batch(cfg, B=2, seed=0):
    rs = np.random.RandomState(seed)
    nt = cfg.vlm.num_image_tokens
    ids = rs.randint(1, 400, (B, nt + 8))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    valid = np.ones_like(ids, dtype=bool)
    valid[1, -2:] = False  # ragged prompt
    actions = np.tanh(rs.randn(B, cfg.chunk_size, cfg.action_dim)).astype(np.float32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(valid),
        "images": jnp.asarray(rs.randn(B, 1, 28, 28, 3), jnp.float32),
        "actions": jnp.asarray(actions),
        "states": jnp.asarray(rs.randn(B, 5), jnp.float32),
    }
    bins = continuous_to_bins(jnp.asarray(actions), cfg)
    batch["action_bins"] = bins + cfg.vlm.llm.vocab_size - cfg.num_bins  # vocab slots
    return batch


@pytest.mark.parametrize("head", ["L1", "Diffusion", "Discrete"])
def test_oft_loss_and_grads(head):
    cfg = _cfg(head, num_bins=64)
    params = init_oft(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    # jitted value_and_grad: loss asserts + grad-flow in one compile
    (loss, m), g = jax.jit(jax.value_and_grad(
        lambda p: oft_loss(p, cfg, batch, jax.random.PRNGKey(1)),
        has_aux=True))(params)
    assert np.isfinite(float(loss))
    gn = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("head", ["L1", "Discrete"])
def test_oft_inference_shapes(head):
    cfg = _cfg(head, num_bins=64)
    params = init_oft(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    out = oft_inference_action(params, cfg, b["input_ids"], b["attention_mask"], b["images"])
    assert out.shape == (2, 4, 3)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-6 or head == "L1"


def test_oft_diffusion_inference_cache_matches_joint():
    """The cached-prompt DDIM path must match re-running prompt+segment jointly."""
    cfg = _cfg("Diffusion", num_bins=64)
    params = init_oft(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    out = oft_inference_action(
        params, cfg, b["input_ids"], b["attention_mask"], b["images"],
        rng=jax.random.PRNGKey(2), ddim_steps=2,
    )
    assert out.shape == (2, 4, 3)
    assert np.isfinite(np.asarray(out)).all()

    # joint (no-cache) single eps evaluation equality at t=90
    from dexbotic_tpu.models.oft import (
        _action_segment, _prompt_embeds, _run_with_segment, _prefill_prompt,
        mlp_resnet, sinusoidal_time_encoding,
    )
    B = 2
    prompt = _prompt_embeds(params, cfg, b["input_ids"], b["attention_mask"], b["images"])
    x = jax.random.normal(jax.random.PRNGKey(5), (B, 4, 3))
    ts = jnp.full((B,), 90, jnp.int32)
    temb = sinusoidal_time_encoding(ts, cfg.hidden)
    seg = _action_segment(params, cfg, B, prompt.dtype, None, x, temb)
    hid_joint = _run_with_segment(params, cfg, prompt, b["attention_mask"], seg)
    cache = _prefill_prompt(params, cfg, prompt, b["attention_mask"])
    hid_cached = _run_with_segment(params, cfg, None, b["attention_mask"], seg, cache=cache)
    np.testing.assert_allclose(
        np.asarray(hid_cached), np.asarray(hid_joint), rtol=2e-4, atol=2e-5
    )


def test_oft_proprio_token():
    cfg = _cfg("L1", use_proprio=True, proprio_dim=5)
    params = init_oft(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    loss, _ = oft_loss(params, cfg, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = oft_inference_action(
        params, cfg, b["input_ids"], b["attention_mask"], b["images"], states=b["states"]
    )
    assert out.shape == (2, 4, 3)


def test_bins_roundtrip():
    cfg = _cfg("Discrete", num_bins=64)
    a = jnp.asarray(np.linspace(-1, 1, 24).reshape(2, 4, 3), jnp.float32)
    bins = continuous_to_bins(a, cfg)
    back = bins_to_continuous(bins.reshape(2, -1), cfg)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1.1 / 63)


def test_generate_and_logprobs_consistent():
    cfg = _cfg("Discrete", num_bins=64)
    params = init_oft(jax.random.PRNGKey(0), cfg)
    b = _batch(cfg)
    actions, bins, logp = oft_generate_action(
        params, cfg, b["input_ids"], b["attention_mask"], b["images"], None,
        jax.random.PRNGKey(3), temperature=1.0,
    )
    assert bins.shape == (2, 12) and logp.shape == (2, 12)
    logp2, entropy = oft_action_log_probs(
        params, cfg, b["input_ids"], b["attention_mask"], b["images"], None, bins
    )
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2), rtol=1e-5, atol=1e-6)
    assert (np.asarray(entropy) > 0).all()
