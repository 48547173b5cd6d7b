"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual mesh.

Verifies the GPipe-scheduled decoder matches the plain lax.scan decoder
(forward AND gradients through reverse-AD of the ppermute schedule), and
that it composes with a data axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.nn.transformer import (
    TransformerConfig,
    embed_tokens,
    init_transformer,
    transformer_forward,
)
from dexbotic_tpu.parallel.pipeline import (
    pipeline_causal_lm_loss,
    pipeline_transformer_forward,
    pp_param_shardings,
)
from jax.sharding import Mesh, PartitionSpec as P

CFG = TransformerConfig(
    vocab_size=256, hidden_size=64, num_layers=8, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, attn_impl="xla",
)


def _mesh(stage: int, data: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[: stage * data]).reshape(stage, data)
    return Mesh(devs, ("stage", "data"))


def _inputs(B=4, T=16, seed=0):
    r = np.random.RandomState(seed)
    ids = jnp.asarray(r.randint(1, 250, (B, T)))
    valid = jnp.ones((B, T), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    grp = positions * valid  # strictly causal
    return ids, valid, positions, grp


def _reference_hidden(params, ids, valid, positions, grp):
    x = embed_tokens(params, CFG, ids)
    out, _ = transformer_forward(CFG, params, x, positions, grp, valid)
    return out


def test_pp_forward_matches_scan():
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    ids, valid, positions, grp = _inputs()
    ref = _reference_hidden(params, ids, valid, positions, grp)

    mesh = _mesh(stage=4, data=2)
    x = embed_tokens(params, CFG, ids)
    out = pipeline_transformer_forward(
        CFG, params, x, positions, grp, valid, mesh, n_micro=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pp_forward_stage8_micro1_and_4():
    params = init_transformer(jax.random.PRNGKey(1), CFG)
    ids, valid, positions, grp = _inputs(seed=3)
    ref = _reference_hidden(params, ids, valid, positions, grp)
    x = embed_tokens(params, CFG, ids)
    for n_micro in (1, 4):
        out = pipeline_transformer_forward(
            CFG, params, x, positions, grp, valid, _mesh(stage=8), n_micro=n_micro
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )


def test_pp_loss_and_grads_match():
    """GPipe backward (AD through scan+ppermute) == plain backward."""
    params = init_transformer(jax.random.PRNGKey(2), CFG)
    ids, valid, positions, grp = _inputs(B=4, T=12, seed=7)
    labels = jnp.where(valid == 1, ids, -100)
    batch = {"input_ids": ids, "attention_mask": valid, "labels": labels}

    def ref_loss(params):
        x = embed_tokens(params, CFG, ids, dtype=jnp.bfloat16)
        hidden, _ = transformer_forward(CFG, params, x, positions, grp, valid)
        from dexbotic_tpu.nn.transformer import lm_logits

        logits = lm_logits(params, CFG, hidden[:, :-1]).astype(jnp.float32)
        lab = labels[:, 1:]
        mask = (lab != -100) & (valid[:, 1:] == 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.where(mask, lab, 0)[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    mesh = _mesh(stage=4, data=2)

    def pp_loss(params):
        return pipeline_causal_lm_loss(params, CFG, batch, mesh, n_micro=2)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_pp, g_pp = jax.value_and_grad(pp_loss)(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=2e-3)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=0.05, atol=2e-3
        )


def test_pp_param_shardings_and_jit_train_step():
    """Full jitted train step with layers sharded over stages at rest."""
    import optax

    params = init_transformer(jax.random.PRNGKey(4), CFG)
    mesh = _mesh(stage=4, data=2)
    shardings = pp_param_shardings(params, CFG, mesh)
    params = jax.tree.map(jax.device_put, params, shardings)
    assert params["layers"]["attn"]["q"]["w"].sharding.spec == P("stage")

    ids, valid, positions, grp = _inputs(B=8, T=12, seed=9)
    labels = jnp.where(valid == 1, ids, -100)
    batch = {"input_ids": ids, "attention_mask": valid, "labels": labels}

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: pipeline_causal_lm_loss(p, CFG, batch, mesh, n_micro=2)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p1, opt_state, l1 = step(params, opt_state, batch)
    p2, _, l2 = step(p1, opt_state, batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # two steps on one batch reduce its loss
    assert p2["layers"]["attn"]["q"]["w"].sharding.spec == P("stage")
