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
    loss, m = muvla_loss(p, CFG, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "reward_loss" in m
    loss2, m2 = muvla_loss(p, CFG, _batch(with_reward=False), jax.random.PRNGKey(1))
    assert "reward_loss" not in m2
    g = jax.grad(lambda pp: muvla_loss(pp, CFG, _batch(), jax.random.PRNGKey(1))[0])(p)
    assert float(jnp.abs(g["reward_head"]["w"]).sum()) > 0
    assert float(jnp.abs(g["qformer"]["queries"]).sum()) > 0
