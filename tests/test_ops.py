import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.ops import attention_xla, flash_attention, make_attn_mask, make_suffix_attn_mask
from dexbotic_tpu.ops.norms import ada_rms_norm, layer_norm, rms_norm
from dexbotic_tpu.ops.rope import apply_rope, rope_cos_sin


def test_make_attn_mask_causal():
    B, N = 2, 5
    input_mask = jnp.ones((B, N), dtype=bool)
    ar = jnp.ones((B, N), dtype=jnp.int32)
    m = make_attn_mask(input_mask, ar)
    expect = np.tril(np.ones((N, N), dtype=bool))
    np.testing.assert_array_equal(np.asarray(m[0]), expect)


def test_make_attn_mask_blocks():
    # prefix of 3 bidirectional tokens, then 2 tokens each opening a group
    input_mask = jnp.ones((1, 5), dtype=bool)
    ar = jnp.array([[0, 0, 0, 1, 1]], dtype=jnp.int32)
    m = np.asarray(make_attn_mask(input_mask, ar)[0])
    # prefix attends to full prefix, not suffix
    assert m[0, :3].all() and not m[0, 3:].any()
    assert m[2, :3].all()
    # token 3 attends prefix + itself
    np.testing.assert_array_equal(m[3], [True, True, True, True, False])
    assert m[4].all()


def test_make_attn_mask_padding():
    input_mask = jnp.array([[True, True, False]])
    ar = jnp.ones((1, 3), dtype=jnp.int32)
    m = np.asarray(make_attn_mask(input_mask, ar)[0])
    assert not m[:, 2].any() and not m[2].any()


def test_suffix_attn_mask_shape():
    B, P, S = 2, 7, 4
    pm = jnp.ones((B, P), dtype=bool)
    par = jnp.zeros((B, P), dtype=jnp.int32)
    sm = jnp.ones((B, S), dtype=bool)
    sar = jnp.array([[1, 1, 0, 0]] * B, dtype=jnp.int32)
    m = make_suffix_attn_mask(sm, sar, pm, par)
    assert m.shape == (B, S, P + S)
    m0 = np.asarray(m[0])
    # all suffix tokens see the full prefix
    assert m0[:, :P].all()
    # suffix token 0 (opens group) sees itself only within the suffix
    np.testing.assert_array_equal(m0[0, P:], [True, False, False, False])
    # suffix tokens 2,3 share token 1's group
    np.testing.assert_array_equal(m0[2, P:], [True, True, True, True])


def test_rms_norm_matches_manual():
    x = jnp.array(np.random.RandomState(0).randn(2, 3, 8), dtype=jnp.float32)
    w = jnp.array(np.random.RandomState(1).rand(8), dtype=jnp.float32)
    got = rms_norm(x, w, eps=1e-6)
    xf = np.asarray(x)
    expect = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)
    # gemma offset
    got_g = rms_norm(x, w, weight_offset=1.0)
    expect_g = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * (1 + np.asarray(w))
    np.testing.assert_allclose(np.asarray(got_g), expect_g, rtol=1e-5)


def test_ada_rms_norm_gating():
    x = jnp.ones((2, 3, 8), dtype=jnp.float32)
    w = jnp.zeros((8,))
    cond = jnp.full((2, 8), 0.5)
    got = ada_rms_norm(x, w, cond, weight_offset=1.0)
    base = rms_norm(x, w, weight_offset=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base) * 1.5, rtol=1e-5)


def test_layer_norm_nonaffine():
    x = jnp.array(np.random.RandomState(0).randn(4, 16), dtype=jnp.float32)
    got = np.asarray(layer_norm(x, eps=1e-6))
    assert abs(got.mean(-1)).max() < 1e-5
    np.testing.assert_allclose(got.std(-1), 1.0, atol=1e-3)


def test_rope_rotation_preserves_norm():
    B, S, H, D = 1, 6, 2, 8
    x = jnp.array(np.random.RandomState(0).randn(B, S, H, D), dtype=jnp.float32)
    pos = jnp.arange(S)[None, :]
    cos, sin = rope_cos_sin(pos, D)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]), rtol=1e-5)


def _rand_attn_inputs(key, B, Sq, Skv, Hq, Hkv, D, causal=False):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, Sq, Hq, D), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (B, Skv, Hkv, D), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (B, Skv, Hkv, D), dtype=jnp.float32)
    if causal:
        assert Sq == Skv
        grp = jnp.broadcast_to(jnp.arange(1, Sq + 1, dtype=jnp.int32), (B, Sq))
        q_grp, kv_grp = grp, grp
    else:
        q_grp = jnp.full((B, Sq), 5, dtype=jnp.int32)
        kv_grp = jnp.zeros((B, Skv), dtype=jnp.int32)
    kv_valid = jnp.ones((B, Skv), dtype=jnp.int32)
    return q, k, v, q_grp, kv_grp, kv_valid


def test_attention_xla_causal_matches_naive():
    q, k, v, qg, kg, valid = _rand_attn_inputs(
        jax.random.PRNGKey(0), 2, 8, 8, 4, 4, 16, causal=True
    )
    out = attention_xla(q, k, v, qg, kg, valid)
    # naive per-row softmax
    scores = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(16)
    mask = np.tril(np.ones((8, 8), dtype=bool))
    scores = np.where(mask[None, None], scores, -1e38)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expect = np.einsum("bhqk,bkhd->bqhd", probs, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("gqa", [1, 4])
@pytest.mark.parametrize("single_max", [0, 1024])
def test_flash_attention_matches_xla(gqa, single_max):
    # single_max=1024 takes the whole-sequence single-grid-step kernel;
    # single_max=0 forces the multi-block online-softmax kernel
    Hkv = 2
    q, k, v, qg, kg, valid = _rand_attn_inputs(
        jax.random.PRNGKey(1), 2, 48, 48, Hkv * gqa, Hkv, 128, causal=True
    )
    ref = attention_xla(q, k, v, qg, kg, valid)
    got = flash_attention(q, k, v, qg, kg, valid, interpret=True, block_q=16,
                          block_kv=16, single_block_max=single_max)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_attention_suffix_vs_cache():
    # suffix of 4 queries attending to prefix(10) + suffix(4), pi0-style
    B, P, S, H, D = 1, 10, 4, 2, 128
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, S, H, D))
    k = jax.random.normal(ks[1], (B, P + S, H, D))
    v = jax.random.normal(ks[2], (B, P + S, H, D))
    # prefix grp 0; suffix: state token opens grp 1, action tokens grp 2
    q_grp = jnp.array([[1, 2, 2, 2]], dtype=jnp.int32)
    kv_grp = jnp.concatenate(
        [jnp.zeros((B, P), jnp.int32), q_grp], axis=1
    )
    kv_valid = jnp.ones((B, P + S), jnp.int32)
    ref = attention_xla(q, k, v, q_grp, kv_grp, kv_valid)
    for single_max in (0, 1024):
        got = flash_attention(
            q, k, v, q_grp, kv_grp, kv_valid, interpret=True, block_q=8,
            block_kv=8, single_block_max=single_max,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_attention_padding_invalid_kv():
    B, S, H, D = 1, 12, 2, 128
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, S, H, D))
    k = jax.random.normal(ks[1], (B, S, H, D))
    v = jax.random.normal(ks[2], (B, S, H, D))
    valid = jnp.array([[1] * 9 + [0] * 3], dtype=jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    ref = attention_xla(q, k, v, grp, grp, valid)
    for single_max in (0, 1024):
        got = flash_attention(q, k, v, grp, grp, valid, interpret=True,
                              block_q=8, block_kv=8, single_block_max=single_max)
        np.testing.assert_allclose(
            np.asarray(got)[:, :9], np.asarray(ref)[:, :9], rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("single_max", [0, 1024])
def test_flash_attention_gradients_match_xla(single_max):
    """flash_attention is differentiable (custom VJP: Pallas forward, XLA
    recompute backward) and its q/k/v gradients match the XLA path — the
    training contract for the auto-dispatch (pallas_call itself has no JVP
    rule, so without the custom VJP any train step through the kernel
    raises)."""
    Hkv, gqa = 2, 2
    q, k, v, qg, kg, valid = _rand_attn_inputs(
        jax.random.PRNGKey(5), 2, 40, 40, Hkv * gqa, Hkv, 128, causal=True
    )

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, qg, kg, valid, interpret=True,
                              block_q=16, block_kv=16,
                              single_block_max=single_max)
        return jnp.sum(out * out)

    def loss_xla(q, k, v):
        out = attention_xla(q, k, v, qg, kg, valid)
        return jnp.sum(out * out)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_gradients_padding_and_segments():
    """Backward kernels under invalid kv tails, GQA group-sum, and packed
    segment isolation (the NaVILA training configuration)."""
    B, S, Hq, Hkv, D = 2, 24, 4, 1, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, S, Hq, D))
    k = jax.random.normal(ks[1], (B, S, Hkv, D))
    v = jax.random.normal(ks[2], (B, S, Hkv, D))
    valid = jnp.asarray(
        np.concatenate([np.ones((B, 18)), np.zeros((B, 6))], axis=1), jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    seg = jnp.asarray(
        np.concatenate([np.zeros((B, 9)), np.ones((B, 15))], axis=1), jnp.int32)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(jnp.where(valid[:, :, None, None] > 0, out, 0.0) ** 2)
        return f

    flash = loss(lambda q, k, v: flash_attention(
        q, k, v, grp, grp, valid, interpret=True, block_q=8, block_kv=8,
        q_seg=seg, kv_seg=seg, single_block_max=0))
    flash_single = loss(lambda q, k, v: flash_attention(
        q, k, v, grp, grp, valid, interpret=True,
        q_seg=seg, kv_seg=seg, single_block_max=1024))
    ref = loss(lambda q, k, v: attention_xla(
        q, k, v, grp, grp, valid, q_seg=seg, kv_seg=seg))

    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for f in (flash, flash_single):
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        for gf, gx in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                       rtol=2e-4, atol=2e-4)
