"""Mixture-of-Experts FFN + expert parallelism (nn/moe.py, beyond reference).

Pins: (a) with identical experts and full capacity, MoE == the dense gated
MLP (routing becomes a no-op because renormalized top-k weights sum to 1);
(b) capacity overflow drops second choices, never NaNs; (c) the Switch
load-balance aux is 1.0 for a uniform router; (d) grads flow through router
AND experts inside the transformer scan; (e) EP-sharded execution on a
('data','expert','model') mesh matches unsharded numerics and a train step
executes with expert-sharded weights at rest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.nn import core
from dexbotic_tpu.nn.moe import expert_capacity, moe_init, moe_mlp
from dexbotic_tpu.nn.transformer import (
    TransformerConfig,
    embed_tokens,
    init_transformer,
    lm_logits,
    transformer_forward,
)
from dexbotic_tpu.parallel.mesh import make_mesh, tp_fsdp_shardings
from jax.sharding import NamedSharding, PartitionSpec as P

MOE_CFG = TransformerConfig(
    vocab_size=64,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=48,
    attn_impl="xla",
    moe_num_experts=4,
    moe_top_k=2,
    moe_capacity_factor=2.0,
)


def _causal(key, B, S, cfg):
    ids = jax.random.randint(key, (B, S), 0, cfg.vocab_size)
    valid = jnp.ones((B, S), jnp.int32)
    grp = jnp.cumsum(valid, axis=1)
    return ids, grp - 1, grp, valid


def test_identical_experts_match_dense():
    H, I, E = 16, 24, 4
    key = jax.random.PRNGKey(0)
    dense = core.gated_mlp_init(key, H, I)
    p = moe_init(jax.random.PRNGKey(1), H, I, E)
    for name in ("gate", "up", "down"):
        p[name]["w"] = jnp.broadcast_to(dense[name]["w"][None], (E,) + dense[name]["w"].shape)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, H))
    y, aux = moe_mlp(p, x, top_k=2, capacity_factor=float(E))  # capacity >= all tokens
    ref = core.gated_mlp(dense, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(aux))


def test_capacity_overflow_drops_not_nans():
    H, I, E = 8, 12, 4
    p = moe_init(jax.random.PRNGKey(0), H, I, E)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, H))
    # capacity_factor small enough that experts overflow
    y, aux = moe_mlp(p, x, top_k=2, capacity_factor=0.25)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.isfinite(float(aux))
    # and strictly fewer slots than assignments exist
    assert expert_capacity(64, E, 2, 0.25) < 64 * 2 // E


def test_uniform_router_aux_is_one():
    H, I, E = 8, 12, 4
    p = moe_init(jax.random.PRNGKey(0), H, I, E)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])  # uniform softmax
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, H))
    _, aux = moe_mlp(p, x, top_k=2)
    # f depends on top_k tie-breaking but P is exactly 1/E; with zero logits
    # top-1 is argmax of equal probs -> expert 0 for every token, f=(1,0,..),
    # aux = E * (1 * 1/E) = 1.0
    assert float(aux) == pytest.approx(1.0, abs=1e-5)


def test_transformer_moe_forward_and_grads():
    p = init_transformer(jax.random.PRNGKey(0), MOE_CFG)
    assert p["layers"]["mlp"]["gate"]["w"].shape == (2, 4, 32, 48)
    assert p["layers"]["mlp"]["router"]["w"].shape == (2, 32, 4)
    ids, pos, grp, valid = _causal(jax.random.PRNGKey(1), 2, 10, MOE_CFG)

    def loss(params):
        x = embed_tokens(params, MOE_CFG, ids)
        from dexbotic_tpu.nn.transformer import Stream, mot_forward

        outs, _, aux = mot_forward(
            [Stream(MOE_CFG, params, x)], pos, grp, valid, want_aux=True
        )
        logits = lm_logits(params, MOE_CFG, outs[0])
        return jnp.mean(logits**2) + 0.01 * aux["moe_aux"]

    val, grads = jax.jit(jax.value_and_grad(loss))(p)
    assert np.isfinite(float(val))
    g_router = np.asarray(grads["layers"]["mlp"]["router"]["w"])
    g_exp = np.asarray(grads["layers"]["mlp"]["down"]["w"])
    assert np.abs(g_router).max() > 0
    assert np.abs(g_exp).max() > 0


def test_moe_ep_sharded_matches_unsharded():
    mesh = make_mesh(data=2, expert=2, model=2)
    assert mesh.shape["expert"] == 2
    p = init_transformer(jax.random.PRNGKey(0), MOE_CFG)
    ids, pos, grp, valid = _causal(jax.random.PRNGKey(1), 4, 8, MOE_CFG)

    def fwd(params, ids):
        x = embed_tokens(params, MOE_CFG, ids)
        h, _ = transformer_forward(MOE_CFG, params, x, pos, grp, valid)
        return lm_logits(params, MOE_CFG, h)

    ref = jax.jit(fwd)(p, ids)

    shardings = tp_fsdp_shardings(p, mesh)
    # expert axis is sharded at rest on the moe kernels
    spec = shardings["layers"]["mlp"]["gate"]["w"].spec
    assert "expert" in [s for s in spec if s is not None]
    p_sh = jax.tree.map(jax.device_put, p, shardings)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = jax.jit(fwd)(p_sh, ids_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_moe_ep_train_step():
    mesh = make_mesh(data=2, expert=2, model=2)
    p = init_transformer(jax.random.PRNGKey(0), MOE_CFG)
    shardings = tp_fsdp_shardings(p, mesh)
    p = jax.tree.map(jax.device_put, p, shardings)
    ids, pos, grp, valid = _causal(jax.random.PRNGKey(1), 4, 8, MOE_CFG)
    ids = jax.device_put(ids, NamedSharding(mesh, P("data")))

    def loss(params):
        x = embed_tokens(params, MOE_CFG, ids)
        from dexbotic_tpu.nn.transformer import Stream, mot_forward

        outs, _, aux = mot_forward(
            [Stream(MOE_CFG, params, x)], pos, grp, valid, want_aux=True
        )
        logits = lm_logits(params, MOE_CFG, outs[0])
        return jnp.mean(logits**2) + 0.01 * aux["moe_aux"]

    @jax.jit
    def step(params):
        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree.map(lambda w, gw: w - 1e-3 * gw, params, g)
        return l, new

    l, p2 = step(p)
    assert np.isfinite(float(l))
    # updated expert kernels keep their expert-sharded placement
    assert "expert" in [
        s for s in p2["layers"]["mlp"]["gate"]["w"].sharding.spec if s is not None
    ]


def test_valid_mask_excludes_padding():
    """ADVICE r3: invalid tokens must not consume capacity slots nor enter
    the f/P load-balance statistics, and produce zero output."""
    H, I, E = 16, 24, 4
    p = moe_init(jax.random.PRNGKey(3), H, I, E)
    B, T = 2, 8
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, H))
    valid = jnp.ones((B, T), jnp.int32).at[:, T // 2 :].set(0)

    # Masked output at invalid slots is exactly zero.
    y, aux = moe_mlp(p, x, top_k=2, capacity_factor=2.0, valid=valid)
    np.testing.assert_array_equal(np.asarray(y[:, T // 2 :]), 0.0)

    # Valid rows' outputs match a run over ONLY the valid prefix (same
    # routing, and pads can no longer evict second choices): use a tight
    # capacity so slot pressure matters.
    y_prefix, aux_prefix = moe_mlp(
        p, x[:, : T // 2], top_k=2, capacity_factor=1.0
    )
    y_tight, aux_tight = moe_mlp(p, x, top_k=2, capacity_factor=0.5, valid=valid)
    # capacity(N=16, f=0.5) == capacity(N=8, f=1.0) == 4 slots/expert
    assert expert_capacity(B * T, E, 2, 0.5) == expert_capacity(B * T // 2, E, 2, 1.0)
    np.testing.assert_allclose(
        np.asarray(y_tight[:, : T // 2]), np.asarray(y_prefix), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(aux_tight), float(aux_prefix), rtol=1e-6)
