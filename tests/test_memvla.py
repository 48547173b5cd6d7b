import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.memvla import (
    MemVLAConfig,
    bank_step,
    init_mem_state,
    init_memvla,
    memvla_inference_action,
    memvla_loss,
    reset_mem_rows,
    se_bottleneck,
)
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig

CFG = MemVLAConfig(
    vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST),
    action_model_type="DiT-S", action_dim=3, chunk_size=4,
    per_token_size=16, mem_length=3, retrieval_layers=2, retrieval_heads=4,
    repeated_diffusion_steps=2,
)


def _batch(B=2, t=0):
    rs = np.random.RandomState(t)
    nt = CFG.vlm.num_image_tokens
    ids = rs.randint(1, 400, (B, nt + 6))
    ids[:, :nt] = IMAGE_TOKEN_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "images": jnp.asarray(rs.randn(B, 1, 28, 28, 3), jnp.float32),
        "actions": jnp.asarray(np.tanh(rs.randn(B, 4, 3)), jnp.float32),
        "timesteps": jnp.full((B,), float(t)),
    }


def test_se_bottleneck_shape():
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, CFG.vlm.llm.hidden_size))
    out = se_bottleneck(p["per_compr"], x)
    assert out.shape == (2, 4, 16)


def test_bank_fill_and_tome_merge():
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    state = init_mem_state(CFG, batch=2)
    per = jax.random.normal(jax.random.PRNGKey(1), (2, CFG.num_per_tokens, 16))
    cog = jax.random.normal(jax.random.PRNGKey(2), (2, 1, CFG.vlm.llm.hidden_size))
    bstep = jax.jit(lambda st, t: bank_step(p, CFG, st, per, cog, t))
    for t in range(5):  # exceed mem_length=3 -> ToMe merges
        per_f, cog_f, state = bstep(state, jnp.full((2,), float(t)))
    assert int(state["per"]["count"][0]) == 3
    assert int(state["cog"]["count"][0]) == 3
    # merged times are averages -> not all integers
    times = np.asarray(state["cog"]["times"][0])
    assert times[-1] == 4.0  # newest appended at the end
    assert np.isfinite(np.asarray(state["per"]["feats"])).all()


def test_reset_mem_rows():
    state = init_mem_state(CFG, batch=2)
    state["cog"]["count"] = jnp.array([2, 3], jnp.int32)
    state = reset_mem_rows(state, jnp.array([True, False]))
    assert int(state["cog"]["count"][0]) == 0
    assert int(state["cog"]["count"][1]) == 3


def test_memvla_loss_and_state_threading():
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    state = init_mem_state(CFG, batch=2)
    lf = jax.jit(lambda batch, st, key: memvla_loss(p, CFG, batch, st, key))
    for t in range(3):
        loss, m, state = lf(_batch(t=t), state, jax.random.PRNGKey(t))
        assert np.isfinite(float(loss))
    assert int(state["cog"]["count"][0]) == 3


@pytest.mark.heavy
def test_memvla_grads():
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    state = init_mem_state(CFG, batch=2)

    def lf(pp):
        loss, _, _ = memvla_loss(pp, CFG, _batch(), state, jax.random.PRNGKey(1))
        return loss

    # jitted: eager reverse-AD dispatches op-by-op on this 1-core host
    g = jax.jit(jax.grad(lf))(p)
    gn = jax.tree.reduce(lambda a, b: a + b, jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.heavy
def test_memvla_inference_memory_changes_actions():
    """Same frame must yield different actions once the bank holds history."""
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    # zero-init final layer / mem-xattn out would hide conditioning at init
    p["action_head"]["final"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(7), p["action_head"]["final"]["w"].shape) * 0.1
    )
    p["action_head"]["blocks"]["xattn"]["o"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(8), p["action_head"]["blocks"]["xattn"]["o"]["w"].shape) * 0.1
    )
    b = _batch(B=1)
    state = init_mem_state(CFG, batch=1)
    # one jitted step reused for all four calls (same shapes -> one compile)
    step = jax.jit(lambda ids, am, imgs, st, t: memvla_inference_action(
        p, CFG, ids, am, imgs, st, t, jax.random.PRNGKey(5)))
    a1, state = step(b["input_ids"], b["attention_mask"], b["images"], state,
                     jnp.zeros((1,)))
    assert a1.shape == (1, 4, 3)
    # feed different frames to populate memory
    for t in range(1, 3):
        bt = _batch(B=1, t=t)
        _, state = step(bt["input_ids"], bt["attention_mask"], bt["images"],
                        state, jnp.full((1,), float(t)))
    a2, _ = step(b["input_ids"], b["attention_mask"], b["images"], state,
                 jnp.full((1,), 3.0))
    assert np.abs(np.asarray(a1) - np.asarray(a2)).max() > 1e-5


@pytest.mark.heavy
def test_memvla_stateful_trainer():
    """Bank state threads through the Trainer aux-state carry."""
    from dexbotic_tpu.exp.optim import OptimizerConfig
    from dexbotic_tpu.exp.trainer import Trainer, TrainerConfig

    p = init_memvla(jax.random.PRNGKey(0), CFG)

    def loss_fn(params, batch, rng, state):
        loss, metrics, new_state = memvla_loss(params, CFG, batch, state, rng)
        new_state = jax.tree.map(jax.lax.stop_gradient, new_state)
        return loss, metrics, new_state

    import tempfile

    from dexbotic_tpu.parallel.mesh import make_mesh

    trainer = Trainer(
        loss_fn, p,
        TrainerConfig(output_dir=tempfile.mkdtemp(), max_steps=3, logging_steps=1,
                      save_steps=100, bf16=False, resume=False),
        OptimizerConfig(learning_rate=1e-4),
        aux_state=init_mem_state(CFG, batch=2),
        mesh=make_mesh(devices=jax.devices()[:2]),  # batch 2 on a 2-dev mesh
    )
    batches = [
        {k: np.asarray(v) for k, v in _batch(t=t).items()} for t in range(3)
    ]
    trainer.train(iter(batches))
    assert trainer.step == 3
    # bank accumulated three frames per row
    assert int(np.asarray(trainer.aux_state["cog"]["count"])[0]) == 3


def test_bank_step_sequential_matches_rowwise():
    """'group'/'stream' semantics: the lax.scan over rows equals manually
    feeding the rows one-by-one through bank_step with a shared B=1 bank,
    including mid-batch resets."""
    from dexbotic_tpu.models.memvla import bank_step_sequential

    p = init_memvla(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(7)
    B = 4
    per = jnp.asarray(rs.randn(B, CFG.num_per_tokens, CFG.per_token_size), jnp.float32)
    cog = jnp.asarray(rs.randn(B, 1, CFG.vlm.llm.hidden_size), jnp.float32)
    ts = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    resets = jnp.asarray([True, False, True, False])  # new episode at row 2

    per_f, cog_f, st = jax.jit(lambda st0: bank_step_sequential(
        p, CFG, st0, per, cog, ts, resets))(init_mem_state(CFG, 1))

    bstep = jax.jit(lambda st, pe, co, t: bank_step(p, CFG, st, pe, co, t))
    st2 = init_mem_state(CFG, 1)
    outs = []
    for i in range(B):
        if bool(resets[i]):
            st2 = reset_mem_rows(st2, jnp.ones((1,), bool))
        pf, cf, st2 = bstep(st2, per[i][None], cog[i][None], ts[i][None])
        outs.append((pf[0], cf[0]))
    np.testing.assert_allclose(np.asarray(per_f),
                               np.stack([o[0] for o in outs]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cog_f),
                               np.stack([o[1] for o in outs]), atol=1e-5)
    # two frames of the second episode in the bank, not four
    assert int(np.asarray(st["cog"]["count"])[0]) == 2

    # within-batch memory is real: row 1 fused != its bank-free fusion
    pf0, cf0, _ = bstep(init_mem_state(CFG, 1), per[1][None],
                        cog[1][None], ts[1][None])
    assert float(np.abs(np.asarray(cog_f)[1] - np.asarray(cf0[0])).max()) > 1e-6


def test_memvla_loss_sequential_bank():
    p = init_memvla(jax.random.PRNGKey(0), CFG)
    batch = _batch(B=2)
    batch["episode_reset"] = jnp.asarray([True, False])
    # one jitted value_and_grad: loss/state checks and grad-flow from a
    # single compile (persistent-cache-warm)
    (loss, (metrics, st)), g = jax.jit(jax.value_and_grad(
        lambda q: (lambda l, m, s: (l, (m, s)))(*memvla_loss(
            q, CFG, batch, init_mem_state(CFG, 1), jax.random.PRNGKey(1),
            sequential_bank=True)), has_aux=True))(p)
    assert np.isfinite(float(loss))
    assert int(np.asarray(st["per"]["count"])[0]) == 2
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
