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


@jax.jit
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
    out = jax.jit(lambda p, x: pipeline_transformer_forward(
        CFG, p, x, positions, grp, valid, mesh, n_micro=2))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pp_forward_stage8_micro1_and_4():
    params = init_transformer(jax.random.PRNGKey(1), CFG)
    ids, valid, positions, grp = _inputs(seed=3)
    ref = _reference_hidden(params, ids, valid, positions, grp)
    x = embed_tokens(params, CFG, ids)
    for n_micro in (1, 4):
        mesh8 = _mesh(stage=8)
        out = jax.jit(lambda p, x, n=n_micro, m=mesh8: pipeline_transformer_forward(
            CFG, p, x, positions, grp, valid, m, n_micro=n))(params, x)
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

    # jit the AD: eager reverse-mode dispatches op-by-op on the 1-core host
    # (~30s); jitted it compiles once and hits the persistent cache warm
    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(params)
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


# ------------------------------------------------------------- MoT-stream PP


def _pi0_cfg_params(adarms=False):
    import dataclasses as dc

    from dexbotic_tpu.models.flow_vla import init_flow_vla, pi0_config, pi05_config
    from dexbotic_tpu.models.presets import (
        EXPERT_TEST, EXPERT_TEST_ADARMS, LLM_TEST, VIT_TEST,
    )

    llm = dc.replace(LLM_TEST, num_layers=2)
    expert = dc.replace(EXPERT_TEST_ADARMS if adarms else EXPERT_TEST, num_layers=2)
    make = pi05_config if adarms else pi0_config
    cfg = make(llm, expert, VIT_TEST, action_dim=8, chunk_size=5,
               projector_type="linear")
    params = init_flow_vla(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _flow_batch(cfg, B=4, seed=3):
    r = np.random.RandomState(seed)
    batch = {
        "input_ids": jnp.asarray(r.randint(1, 400, (B, 6))),
        "attention_mask": jnp.ones((B, 6), jnp.int32),
        "images": jnp.asarray(r.randn(B, 2, 28, 28, 3), jnp.float32),
        "image_masks": jnp.ones((B, 2), jnp.int32),
        "actions": jnp.asarray(r.randn(B, cfg.chunk_size, cfg.action_dim), jnp.float32),
        "states": jnp.asarray(r.randn(B, cfg.action_dim), jnp.float32),
    }
    return batch


def test_pp_mot_forward_matches_mot():
    """pipeline_mot_forward == mot_forward for the pi0 two-tree layer step
    (prefix through the LLM weights, suffix through the expert, one joint
    attention), pipelined over 2 stages x 2 data shards."""
    from dexbotic_tpu.models.flow_vla import (
        _positions_and_grp, embed_prefix, embed_suffix,
    )
    from dexbotic_tpu.nn.transformer import Stream, mot_forward
    from dexbotic_tpu.parallel.pipeline import pipeline_mot_forward

    cfg, params = _pi0_cfg_params()
    batch = _flow_batch(cfg)
    B = batch["actions"].shape[0]
    x_t = jnp.asarray(np.random.RandomState(4).randn(
        B, cfg.chunk_size, cfg.action_dim), jnp.float32)
    time = jnp.full((B,), 0.5, jnp.float32)

    prefix_tokens, prefix_mask, prefix_ar = embed_prefix(
        params, cfg, batch["images"], batch["image_masks"],
        batch["input_ids"], batch["attention_mask"],
    )
    suffix_tokens, suffix_mask, suffix_ar, cond = embed_suffix(
        params, cfg, batch["states"], x_t, time, dtype=prefix_tokens.dtype
    )
    mask, grp, positions = _positions_and_grp(
        prefix_mask, prefix_ar, suffix_mask, suffix_ar
    )
    ref, _ = jax.jit(lambda p, pt, st: mot_forward(
        [Stream(cfg.llm, p["vlm"]["llm"], pt),
         Stream(cfg.expert, p["expert"], st)],
        positions=positions, q_grp=grp, q_valid=mask,
    ))(params, prefix_tokens, suffix_tokens)

    mesh = _mesh(stage=2, data=2)
    outs = jax.jit(lambda p, pt, st: pipeline_mot_forward(
        (cfg.llm, cfg.expert),
        (p["vlm"]["llm"], p["expert"]),
        (pt, st),
        positions, grp, mask, mesh, n_micro=2,
    ))(params, prefix_tokens, suffix_tokens)
    for o, r2 in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r2),
                                   rtol=2e-4, atol=2e-4)


def test_pp_flow_vla_loss_and_grads_match():
    """pipeline_flow_vla_loss == flow_vla_loss (value and grads through the
    reverse-AD GPipe schedule), incl. the pi0.5 adaRMS cond path."""
    from dexbotic_tpu.models.flow_vla import flow_vla_loss
    from dexbotic_tpu.parallel.pipeline import pipeline_flow_vla_loss

    for adarms in (False, True):
        cfg, params = _pi0_cfg_params(adarms=adarms)
        batch = _flow_batch(cfg)
        rng = jax.random.PRNGKey(9)
        mesh = _mesh(stage=2, data=2)
        # one jitted value_and_grad per side: loss and grads from a single
        # trace, compiled once (persistent-cache-warm) instead of eager AD
        ref_loss, g_ref = jax.jit(jax.value_and_grad(
            lambda p: flow_vla_loss(p, cfg, batch, rng)[0]))(params)
        pp_loss, g_pp = jax.jit(jax.value_and_grad(
            lambda p: pipeline_flow_vla_loss(p, cfg, batch, rng, mesh,
                                             n_micro=2)[0]))(params)
        np.testing.assert_allclose(float(pp_loss), float(ref_loss),
                                   rtol=2e-4, atol=2e-4)
        flat_r, _ = jax.tree_util.tree_flatten(g_ref)
        flat_p, _ = jax.tree_util.tree_flatten(g_pp)
        for a, b in zip(flat_r, flat_p):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=5e-4)
