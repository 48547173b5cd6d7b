import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.nn.transformer import (
    Stream,
    TransformerConfig,
    embed_tokens,
    init_kv_cache,
    init_transformer,
    lm_logits,
    mot_forward,
    transformer_forward,
)

CFG = TransformerConfig(
    vocab_size=64,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=64,
    attn_impl="xla",
)

EXPERT = TransformerConfig(
    vocab_size=1,
    hidden_size=16,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=32,
    has_embed=False,
    attn_impl="xla",
)


def test_init_shapes():
    p = init_transformer(jax.random.PRNGKey(0), CFG)
    assert p["embed"]["embedding"].shape == (64, 32)
    assert p["layers"]["attn"]["q"]["w"].shape == (2, 32, 32)
    assert p["layers"]["mlp"]["gate"]["w"].shape == (2, 32, 64)
    assert p["norm"]["w"].shape == (32,)


def _causal_inputs(key, B, S):
    ids = jax.random.randint(key, (B, S), 0, CFG.vocab_size)
    valid = jnp.ones((B, S), jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    positions = grp - 1
    return ids, positions, grp, valid


def test_causal_forward_and_logits():
    p = init_transformer(jax.random.PRNGKey(0), CFG)
    ids, pos, grp, valid = _causal_inputs(jax.random.PRNGKey(1), 2, 10)
    x = embed_tokens(p, CFG, ids)
    out, _ = transformer_forward(CFG, p, x, pos, grp, valid)
    assert out.shape == (2, 10, 32)
    logits = lm_logits(p, CFG, out)
    assert logits.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_causal_prefix_invariance():
    """Causal: output at position t must not depend on tokens after t."""
    p = init_transformer(jax.random.PRNGKey(0), CFG)
    ids, pos, grp, valid = _causal_inputs(jax.random.PRNGKey(1), 1, 8)
    x = embed_tokens(p, CFG, ids)
    out_full, _ = transformer_forward(CFG, p, x, pos, grp, valid)
    out_half, _ = transformer_forward(
        CFG, p, x[:, :4], pos[:, :4], grp[:, :4], valid[:, :4]
    )
    np.testing.assert_allclose(
        np.asarray(out_full[:, :4]), np.asarray(out_half), rtol=2e-4, atol=1e-5
    )


def test_ar_decode_matches_full_forward():
    p = init_transformer(jax.random.PRNGKey(0), CFG)
    B, S = 2, 6
    ids, pos, grp, valid = _causal_inputs(jax.random.PRNGKey(1), B, S)
    x = embed_tokens(p, CFG, ids)
    out_full, _ = transformer_forward(CFG, p, x, pos, grp, valid)

    # prefill 3 tokens into a cache sized for S, then decode 3 one at a time
    cache = init_kv_cache(CFG, B, S, dtype=jnp.float32)
    out_pre, cache = transformer_forward(
        CFG, p, x[:, :3], pos[:, :3], grp[:, :3], valid[:, :3],
        cache=cache, update_cache=True,
    )
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_full[:, :3]), rtol=2e-4, atol=1e-5)
    for t in range(3, S):
        out_t, cache = transformer_forward(
            CFG, p, x[:, t : t + 1], pos[:, t : t + 1], grp[:, t : t + 1],
            valid[:, t : t + 1], cache=cache, update_cache=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_t[:, 0]), np.asarray(out_full[:, t]), rtol=2e-4, atol=1e-5
        )
    assert int(cache["length"]) == S


def _mot_setup(adarms=False):
    expert_cfg = EXPERT
    if adarms:
        expert_cfg = TransformerConfig(
            **{**EXPERT.__dict__, "adarms_cond_dim": 12}
        )
    llm_p = init_transformer(jax.random.PRNGKey(0), CFG)
    ex_p = init_transformer(jax.random.PRNGKey(1), expert_cfg)
    B, P, S = 2, 7, 4
    key = jax.random.PRNGKey(2)
    prefix = jax.random.normal(key, (B, P, CFG.hidden_size))
    suffix = jax.random.normal(jax.random.PRNGKey(3), (B, S, expert_cfg.hidden_size))
    cond = jax.random.normal(jax.random.PRNGKey(4), (B, 12)) if adarms else None
    # pi0 grouping: prefix bidirectional (grp 0 after cumsum... use ar bits)
    ar = np.zeros((B, P + S), np.int32)
    ar[:, P] = 1  # state token opens a group
    ar[:, P + 1] = 1  # first action token opens the final group
    grp = jnp.cumsum(jnp.array(ar), axis=1)
    valid = jnp.ones((B, P + S), jnp.int32)
    positions = jnp.cumsum(valid, axis=1) - 1
    return CFG, expert_cfg, llm_p, ex_p, prefix, suffix, cond, grp, valid, positions, B, P, S


@pytest.mark.parametrize("adarms", [False, True])
def test_mot_joint_vs_cached_suffix(adarms):
    """pi0 inference property: prefill-prefix + frozen-cache suffix must equal
    the joint forward over [prefix; suffix]."""
    (cfg, ecfg, llm_p, ex_p, prefix, suffix, cond, grp, valid, positions,
     B, P, S) = _mot_setup(adarms)

    # joint forward (training path)
    outs_joint, _ = mot_forward(
        [Stream(cfg, llm_p, prefix), Stream(ecfg, ex_p, suffix, cond)],
        positions=positions, q_grp=grp, q_valid=valid,
    )

    # prefill prefix only -> cache
    _, cache = mot_forward(
        [Stream(cfg, llm_p, prefix), Stream(ecfg, ex_p, None, cond)],
        positions=positions[:, :P], q_grp=grp[:, :P], q_valid=valid[:, :P],
        update_cache=True,
    )
    # suffix-only forward against frozen cache
    outs_suffix, _ = mot_forward(
        [Stream(cfg, llm_p, None), Stream(ecfg, ex_p, suffix, cond)],
        positions=positions[:, P:], q_grp=grp[:, P:], q_valid=valid[:, P:],
        cache=cache, update_cache=False,
    )
    assert outs_suffix[0] is None
    np.testing.assert_allclose(
        np.asarray(outs_suffix[1]), np.asarray(outs_joint[1]), rtol=2e-4, atol=1e-5
    )


def test_mot_suffix_does_not_leak_into_prefix():
    """Prefix outputs must be independent of suffix content (block-causal)."""
    (cfg, ecfg, llm_p, ex_p, prefix, suffix, cond, grp, valid, positions,
     B, P, S) = _mot_setup()
    outs1, _ = mot_forward(
        [Stream(cfg, llm_p, prefix), Stream(ecfg, ex_p, suffix)],
        positions=positions, q_grp=grp, q_valid=valid,
    )
    outs2, _ = mot_forward(
        [Stream(cfg, llm_p, prefix), Stream(ecfg, ex_p, suffix * 3.0 + 1.0)],
        positions=positions, q_grp=grp, q_valid=valid,
    )
    np.testing.assert_allclose(np.asarray(outs1[0]), np.asarray(outs2[0]), rtol=1e-5)
    assert np.abs(np.asarray(outs1[1]) - np.asarray(outs2[1])).max() > 1e-3


def test_qk_norm_and_gemma_flags():
    cfg = TransformerConfig(
        vocab_size=32, hidden_size=16, num_layers=1, num_heads=2, num_kv_heads=1,
        head_dim=8, intermediate_size=32, qk_norm=True, norm_offset=1.0,
        embed_scale=True, act="gelu_tanh", attn_impl="xla",
    )
    p = init_transformer(jax.random.PRNGKey(0), cfg)
    assert "q_norm" in p["layers"]["attn"]
    ids = jnp.zeros((1, 4), jnp.int32)
    x = embed_tokens(p, cfg, ids)
    # gemma embed scaling
    np.testing.assert_allclose(
        np.asarray(x),
        np.broadcast_to(np.asarray(p["embed"]["embedding"][0]) * 4.0, (1, 4, 16)),
        rtol=1e-6,
    )
    valid = jnp.ones((1, 4), jnp.int32)
    grp = jnp.cumsum(valid, 1)
    out, _ = transformer_forward(cfg, p, x, grp - 1, grp, valid)
    assert np.isfinite(np.asarray(out)).all()


def test_remat_matches():
    p = init_transformer(jax.random.PRNGKey(0), CFG)
    ids, pos, grp, valid = _causal_inputs(jax.random.PRNGKey(1), 1, 5)
    x = embed_tokens(p, CFG, ids)
    o1, _ = transformer_forward(CFG, p, x, pos, grp, valid, remat=False)
    o2, _ = transformer_forward(CFG, p, x, pos, grp, valid, remat=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
