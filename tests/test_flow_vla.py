import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.models.flow_vla import (
    FlowVLAConfig,
    dm0_config,
    embed_prefix,
    embed_suffix,
    flow_vla_inference_action,
    flow_vla_loss,
    init_flow_vla,
    pi0_config,
    pi05_config,
    posemb_sincos,
    _positions_and_grp,
    _streams,
)
from dexbotic_tpu.models.presets import EXPERT_TEST, EXPERT_TEST_ADARMS, LLM_TEST, VIT_TEST
from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.transformer import Stream, mot_forward

PI0 = pi0_config(LLM_TEST, EXPERT_TEST, VIT_TEST, action_dim=8, chunk_size=5,
                 projector_type="linear")
PI05 = pi05_config(LLM_TEST, EXPERT_TEST_ADARMS, VIT_TEST, action_dim=8, chunk_size=5,
                   projector_type="linear")
QWEN_LLM = dataclasses.replace(LLM_TEST, qk_norm=True)
QWEN_EXPERT = dataclasses.replace(EXPERT_TEST, qk_norm=True)
DM0 = dm0_config(QWEN_LLM, QWEN_EXPERT, VIT_TEST, action_dim=8, chunk_size=5,
                 projector_type="linear")

CONFIGS = {"pi0": PI0, "pi05": PI05, "dm0": DM0}


def _inputs(cfg, B=2, n_views=2, text_len=6, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    images = jax.random.normal(ks[0], (B, n_views, 28, 28, 3))
    image_masks = jnp.array([[1] * n_views, [1] + [0] * (n_views - 1)], jnp.int32)[:B]
    input_ids = jax.random.randint(ks[1], (B, text_len), 1, cfg.llm.vocab_size)
    text_mask = jnp.ones((B, text_len), jnp.int32)
    states = jax.random.normal(ks[2], (B, cfg.action_dim))
    actions = jnp.tanh(jax.random.normal(ks[3], (B, cfg.chunk_size, cfg.action_dim)))
    return images, image_masks, input_ids, text_mask, states, actions


def test_posemb_sincos_range():
    t = jnp.array([0.0, 0.5, 1.0])
    emb = posemb_sincos(t, 16)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 1.0, atol=1e-6)  # cos(0)=1


@pytest.mark.parametrize("name", list(CONFIGS))
def test_loss_and_grads(name):
    cfg = CONFIGS[name]
    params = init_flow_vla(jax.random.PRNGKey(0), cfg)
    images, image_masks, ids, tmask, states, actions = _inputs(cfg)
    batch = {
        "images": images, "image_masks": image_masks, "input_ids": ids,
        "attention_mask": tmask, "states": states, "actions": actions,
    }
    # jitted value_and_grad: loss asserts + grad-flow in one compile
    (loss, metrics), g = jax.jit(jax.value_and_grad(
        lambda p: flow_vla_loss(p, cfg, batch, jax.random.PRNGKey(1)),
        has_aux=True))(params)
    assert np.isfinite(float(loss))
    gn = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("name", list(CONFIGS))
def test_inference_shape_and_determinism(name):
    cfg = CONFIGS[name]
    params = init_flow_vla(jax.random.PRNGKey(0), cfg)
    images, image_masks, ids, tmask, states, _ = _inputs(cfg)
    out1 = flow_vla_inference_action(
        params, cfg, ids, tmask, images, image_masks, states, jax.random.PRNGKey(2)
    )
    assert out1.shape == (2, cfg.chunk_size, cfg.action_dim)
    out2 = flow_vla_inference_action(
        params, cfg, ids, tmask, images, image_masks, states, jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)


def test_inference_cached_suffix_matches_joint():
    """One Euler step via frozen cache must equal the joint forward's v_t."""
    cfg = PI0
    params = init_flow_vla(jax.random.PRNGKey(0), cfg)
    images, image_masks, ids, tmask, states, _ = _inputs(cfg)
    B = 2
    x_t = jax.random.normal(jax.random.PRNGKey(9), (B, cfg.chunk_size, cfg.action_dim))
    time = jnp.full((B,), 1.0)

    prefix_tokens, prefix_mask, prefix_ar = embed_prefix(
        params, cfg, images, image_masks, ids, tmask
    )
    suffix_tokens, suffix_mask, suffix_ar, cond = embed_suffix(
        params, cfg, states, x_t, time, dtype=prefix_tokens.dtype
    )
    mask, grp, pos = _positions_and_grp(prefix_mask, prefix_ar, suffix_mask, suffix_ar)
    outs_joint, _ = mot_forward(
        _streams(params, cfg, prefix_tokens, suffix_tokens, cond),
        positions=pos, q_grp=grp, q_valid=mask,
    )
    v_joint = core.linear(params["action_out_proj"], outs_joint[1][:, -cfg.chunk_size:])

    # one-step inference path
    out1 = flow_vla_inference_action(
        params, cfg, ids, tmask, images, image_masks, states,
        jax.random.PRNGKey(0), num_steps=1,
    )
    # reproduce: x1 = noise + v * (-1)
    noise = jax.random.normal(jax.random.PRNGKey(0), x_t.shape, jnp.float32)
    prefix_tokens2, _, _ = embed_prefix(params, cfg, images, image_masks, ids, tmask)
    suffix_tokens2, suffix_mask2, suffix_ar2, cond2 = embed_suffix(
        params, cfg, states, noise, time, dtype=prefix_tokens2.dtype
    )
    mask2, grp2, pos2 = _positions_and_grp(prefix_mask, prefix_ar, suffix_mask2, suffix_ar2)
    outs2, _ = mot_forward(
        _streams(params, cfg, prefix_tokens2, suffix_tokens2, cond2),
        positions=pos2, q_grp=grp2, q_valid=mask2,
    )
    v2 = core.linear(params["action_out_proj"], outs2[1][:, -cfg.chunk_size:])
    expect = np.asarray(noise) - np.asarray(v2, np.float32)
    np.testing.assert_allclose(np.asarray(out1), expect, rtol=2e-3, atol=2e-4)


def test_image_mask_blocks_missing_view():
    """Masked-out views must not affect the output."""
    cfg = PI0
    params = init_flow_vla(jax.random.PRNGKey(0), cfg)
    images, _, ids, tmask, states, _ = _inputs(cfg, B=1, n_views=2)
    masks = jnp.array([[1, 0]], jnp.int32)
    out1 = flow_vla_inference_action(
        params, cfg, ids, tmask, images, masks, states, jax.random.PRNGKey(3)
    )
    images2 = images.at[:, 1].set(images[:, 1] * 5.0 + 1.0)
    out2 = flow_vla_inference_action(
        params, cfg, ids, tmask, images2, masks, states, jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_dm0_causal_prefix_differs_from_pi0_masking():
    """DM0's prefix must be causal: early prefix outputs independent of later
    prefix tokens; pi0's bidirectional prefix is not."""
    for cfg, expect_causal in ((DM0, True), (PI0, False)):
        params = init_flow_vla(jax.random.PRNGKey(0), cfg)
        images, image_masks, ids, tmask, states, _ = _inputs(cfg, B=1)
        prefix_tokens, prefix_mask, prefix_ar = embed_prefix(
            params, cfg, images, image_masks, ids, tmask
        )
        _, grp, pos = _positions_and_grp(prefix_mask, prefix_ar)
        outs1, _ = mot_forward(
            [Stream(cfg.llm, params["vlm"]["llm"], prefix_tokens),
             Stream(cfg.expert, params["expert"], None)],
            positions=pos, q_grp=grp, q_valid=prefix_mask,
        )
        # perturb the LAST text token's embedding
        pt2 = prefix_tokens.at[:, -1].set(prefix_tokens[:, -1] * 3.0 + 1.0)
        outs2, _ = mot_forward(
            [Stream(cfg.llm, params["vlm"]["llm"], pt2),
             Stream(cfg.expert, params["expert"], None)],
            positions=pos, q_grp=grp, q_valid=prefix_mask,
        )
        diff_first = float(jnp.abs(outs1[0][:, 0] - outs2[0][:, 0]).max())
        if expect_causal:
            assert diff_first < 1e-6, diff_first
        else:
            assert diff_first > 1e-4, diff_first
