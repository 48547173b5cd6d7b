import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dexbotic_tpu.models.muvla import MUVLAConfig, fuse_obs_with_history, init_muvla, muvla_loss
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig

CFG = MUVLAConfig(
    vlm=VLMConfig(llm=LLM_TEST, vit=VIT_TEST),
    obs_vit=VIT_TEST,
    inter_dim=32,
    num_history_queries=6,
    fuse_heads=4,
)


def _batch(B=2, n_views=3, with_reward=True):
    rs = np.random.RandomState(0)
    n_fused = CFG.num_history_queries + CFG.obs_vit.num_output_tokens  # 6 + 4
    ids = rs.randint(1, 400, (B, n_fused + 8))
    ids[:, :n_fused] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, : n_fused + 4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones(ids.shape, jnp.int32),
        "labels": jnp.asarray(labels),
        "map_images": jnp.asarray(rs.randn(B, 28, 28, 3), jnp.float32),
        "obs_images": jnp.asarray(rs.randn(B, n_views, 28, 28, 3), jnp.float32),
    }
    if with_reward:
        batch["reward"] = jnp.asarray(rs.rand(B), jnp.float32)
    return batch


def test_fusion_shapes():
    p = init_muvla(jax.random.PRNGKey(0), CFG)
    b = _batch()
    tokens = fuse_obs_with_history(p, CFG, b["map_images"], b["obs_images"])
    # queries (6) + current obs tokens (4), projected into llm hidden
    assert tokens.shape == (2, 10, CFG.vlm.llm.hidden_size)


def test_fusion_no_history():
    p = init_muvla(jax.random.PRNGKey(0), CFG)
    b = _batch(n_views=1)
    tokens = fuse_obs_with_history(p, CFG, b["map_images"], b["obs_images"])
    assert tokens.shape == (2, 4, CFG.vlm.llm.hidden_size)


def test_muvla_loss_reward_weighting_and_expectile():
    p = init_muvla(jax.random.PRNGKey(0), CFG)
    # jitted value_and_grad: loss asserts + grad-flow in one compile
    (loss, m), g = jax.jit(jax.value_and_grad(
        lambda pp: muvla_loss(pp, CFG, _batch(), jax.random.PRNGKey(1)),
        has_aux=True))(p)
    assert np.isfinite(float(loss))
    assert "reward_loss" in m
    loss2, m2 = jax.jit(lambda pp: muvla_loss(
        pp, CFG, _batch(with_reward=False), jax.random.PRNGKey(1)))(p)
    assert "reward_loss" not in m2
    assert float(jnp.abs(g["reward_head"]["w"]).sum()) > 0
    assert float(jnp.abs(g["qformer"]["queries"]).sum()) > 0


def test_muvla_generate_fused_tokens():
    """AR decode over the fused map+obs token prompt (VERDICT r1 item 8;
    reference muvla_arch.py:609-682)."""
    from dexbotic_tpu.models.muvla import muvla_generate

    p = init_muvla(jax.random.PRNGKey(0), CFG)
    b = _batch(B=2, n_views=3)
    assert CFG.num_fused_tokens(3) == 10
    tokens, logps = muvla_generate(
        p, CFG, b["input_ids"], b["attention_mask"],
        b["map_images"], b["obs_images"],
        max_new_tokens=6, eos_token_id=1, rng=jax.random.PRNGKey(1),
    )
    assert tokens.shape == (2, 6) and logps.shape == (2, 6)
    assert np.isfinite(np.asarray(logps)).all()
    # greedy decode is deterministic
    tokens2, _ = muvla_generate(
        p, CFG, b["input_ids"], b["attention_mask"],
        b["map_images"], b["obs_images"],
        max_new_tokens=6, eos_token_id=1, rng=jax.random.PRNGKey(2),
    )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_muvla_server_get_response():
    """The serving path end-to-end at the handler level: map + obs frames in,
    generated text out."""
    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.muvla_exp import MUVLAExp, MUVLAModelConfig
    from dexbotic_tpu.exp.serve import MUVLAServer

    exp = MUVLAExp(
        model=MUVLAModelConfig(
            llm_preset="test", vit_preset="test", obs_vit_preset="test",
            inter_dim=32, num_history_queries=6, fuse_heads=4,
        ),
        data=base_exp.DataConfig(image_processor="28"),
    )
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = exp.model.build_config()
    params = init_muvla(jax.random.PRNGKey(0), cfg)
    server = MUVLAServer(exp, cfg, params, tokenizer, max_new_tokens=4)

    rs = np.random.RandomState(0)
    frames = [
        ("map", rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)),
        ("obs0", rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)),
        ("obs1", rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)),
    ]
    out = server.get_response({"text": "go to the door"}, frames)
    assert isinstance(out["text"], str)


def test_muvla_server_continuous_batching_matches_sequential():
    """With continuous_batching, concurrent requests coalesce into shared
    decode steps (exp/decode_engine.py) and still produce the same greedy
    text as the fused per-request generate path."""
    import threading

    from dexbotic_tpu.exp import base_exp
    from dexbotic_tpu.exp.muvla_exp import MUVLAExp, MUVLAModelConfig
    from dexbotic_tpu.exp.serve import MUVLAServer

    exp = MUVLAExp(
        model=MUVLAModelConfig(
            llm_preset="test", vit_preset="test", obs_vit_preset="test",
            inter_dim=32, num_history_queries=6, fuse_heads=4,
        ),
        data=base_exp.DataConfig(image_processor="28"),
    )
    tokenizer = exp.tokenizer.build_tokenizer()
    cfg = exp.model.build_config()
    params = init_muvla(jax.random.PRNGKey(0), cfg)
    plain = MUVLAServer(exp, cfg, params, tokenizer, max_new_tokens=4)
    cb = MUVLAServer(exp, cfg, params, tokenizer, max_new_tokens=4,
                     continuous_batching=2)
    assert cb.concurrent and cb.engine is not None
    try:
        rs = np.random.RandomState(7)
        reqs = []
        for i in range(3):
            frames = [
                ("map", rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)),
                ("obs0", rs.randint(0, 255, (28, 28, 3)).astype(np.uint8)),
            ]
            reqs.append(({"text": f"go to the door {i}"}, frames))
        expected = [plain.get_response(f, fr)["text"] for f, fr in reqs]

        results = [None] * len(reqs)

        def run(i):
            results[i] = cb.get_response(*reqs[i])["text"]

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert results == expected
        assert cb.engine.batched_steps > 0  # decode steps actually coalesced
    finally:
        cb.engine.close()
