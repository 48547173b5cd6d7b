import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.exp.rl.grpo import (
    GRPOConfig,
    accuracy_filter,
    grpo_outcome_advantage,
    outcome_token_rewards,
    ppo_clip_loss,
    response_mask,
)
from dexbotic_tpu.exp.rl.rl_trainer import (
    GRPOUpdater,
    RolloutConfig,
    collect_rollouts,
    filter_and_redistribute,
    flatten_rollouts,
    prepare_update_batch,
)
from dexbotic_tpu.models.oft import OFTConfig, init_oft, oft_generate_action
from dexbotic_tpu.models.presets import LLM_TEST, VIT_TEST
from dexbotic_tpu.models.vlm import VLMConfig
from dexbotic_tpu.sim_envs.factory import create_env_batch


def test_grpo_advantage_group_zscore():
    rewards = jnp.zeros((4, 3)).at[:, -1].set(jnp.array([1.0, 0.0, 1.0, 1.0]))
    mask = jnp.ones((4, 3))
    index = jnp.array([0, 0, 1, 1])
    adv, ret = grpo_outcome_advantage(rewards, mask, index, num_groups=2)
    a = np.asarray(adv[:, 0])
    # group 0: scores [1,0] -> mean .5 std (bessel) ~.7071 -> z ~ +-0.7071
    np.testing.assert_allclose(a[0], 0.7071, atol=1e-3)
    np.testing.assert_allclose(a[1], -0.7071, atol=1e-3)
    # group 1: identical scores -> std 0 -> z = 0
    np.testing.assert_allclose(a[2:], 0.0, atol=1e-5)


def test_grpo_single_member_group():
    rewards = jnp.zeros((1, 2)).at[:, -1].set(5.0)
    adv, _ = grpo_outcome_advantage(rewards, jnp.ones((1, 2)), jnp.array([0]), 1)
    # mean 0, std 1 quirk -> z = 5/(1+eps)
    np.testing.assert_allclose(np.asarray(adv[0, 0]), 5.0, rtol=1e-4)


def test_ppo_clip_loss_matches_manual():
    old = jnp.log(jnp.full((2, 2), 0.5))
    new = jnp.log(jnp.array([[0.8, 0.5], [0.2, 0.5]]))
    adv = jnp.array([[1.0, 1.0], [-1.0, 1.0]])
    mask = jnp.ones((2, 2))
    loss, frac, kl = ppo_clip_loss(old, new, adv, mask, 0.2, 0.28)
    ratio = np.exp(np.asarray(new) - np.asarray(old))
    pg1 = -np.asarray(adv) * ratio
    pg2 = -np.asarray(adv) * np.clip(ratio, 0.8, 1.28)
    expect = np.maximum(pg1, pg2).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_reward_placement_and_mask():
    r = outcome_token_rewards(jnp.array([1.0, 0.0]), jnp.array([3, 2]), 2, 8, 5.0)
    assert float(r[0, 5]) == 5.0 and float(r.sum()) == 5.0
    m = response_mask(jnp.array([3, 2]), 2, 8)
    assert m[0].sum() == 6 and m[1].sum() == 4


def test_accuracy_filter():
    success = jnp.array([1.0, 1.0, 0.0, 1.0])
    index = jnp.array([0, 0, 1, 1])
    keep = accuracy_filter(success, index, 2)
    np.testing.assert_array_equal(np.asarray(keep), [False, False, True, True])


VLM = VLMConfig(llm=LLM_TEST, vit=VIT_TEST)
OFT = OFTConfig(vlm=VLM, action_model_type="Discrete", action_dim=3, chunk_size=4,
                num_bins=32)


class _Cfg:
    max_episode_steps = 16
    obs_dim = (28, 28, 3)
    mock_success_prob = 0.5


def _make_actor(params):
    nt = OFT.vlm.num_image_tokens

    gen = jax.jit(
        lambda ids, valid, imgs, r: oft_generate_action(
            params, OFT, ids, valid, imgs, None, r, temperature=1.0
        )
    )

    def actor_fn(obs_list, instructions, rng):
        B = len(obs_list)
        imgs = np.stack(
            [o["observation"]["head_camera"]["rgb"].astype(np.float32) / 255.0 for o in obs_list]
        )[:, None]
        ids = np.full((B, nt + 4), 7, np.int64)
        ids[:, :nt] = IMAGE_TOKEN_INDEX
        valid = np.ones_like(ids, dtype=bool)
        actions, bins, logp = gen(jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(imgs), rng)
        return actions, bins, logp, ids, valid, imgs[:, 0]

    return actor_fn


def test_rl_end_to_end_mock():
    """Full GRPO cycle on the mock env: rollout -> filter -> update."""
    params = init_oft(jax.random.PRNGKey(0), OFT)
    envs = create_env_batch(
        "mock", "mock_suite", ["t0", "t0", "t1", "t1"], [0, 1, 2, 3], [10, 11, 12, 13],
        _Cfg(), threaded=False,
    )
    rcfg = RolloutConfig(max_env_steps=16, chunk_steps=4)
    buf = collect_rollouts(
        envs, _make_actor(params), rcfg, jax.random.PRNGKey(1),
        group_index=np.array([0, 0, 1, 1]),
    )
    assert buf.chunk_count.max() <= 4 and buf.chunk_count.min() >= 1
    idx = filter_and_redistribute(buf, GRPOConfig(), rcfg, num_groups=2)
    assert len(idx) == 4

    flat = flatten_rollouts(buf)
    assert flat["bins"].shape == (16, 12)
    batch = prepare_update_batch(flat, GRPOConfig(entropy_coeff=0.01), num_groups=2)
    assert np.isfinite(np.asarray(batch["advantages"])).all()

    updater = GRPOUpdater(OFT, GRPOConfig(entropy_coeff=0.01), params, learning_rate=1e-4)
    params_before = jax.tree.map(lambda x: np.asarray(x), params)  # step donates
    new_params, metrics = updater.update(params, batch, micro_batch_size=8)
    assert np.isfinite(metrics["loss"])
    assert "clip_frac" in metrics and "approx_kl" in metrics
    # params actually moved
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(np.sum(np.abs(a - np.asarray(b)))), params_before, new_params),
    )
    assert diff > 0
