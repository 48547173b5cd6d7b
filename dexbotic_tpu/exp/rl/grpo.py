"""GRPO core: group-normalized outcome advantages + PPO-clip policy loss.

Pinned to /root/reference/dexbotic/exp/rl/rl_base.py:35-199 and the reward
manager at exp/rl/rl_trainer.py:187-248 — reimplemented as pure jnp with
segment ops instead of Python dict grouping.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    gamma: float = 0.99
    lam: float = 0.95
    epsilon: float = 1e-6
    n_samples: int = 8  # rollouts per prompt group
    clip_ratio_low: float = 0.2
    clip_ratio_high: float = 0.28
    entropy_coeff: float = 0.0
    reward_coef: float = 5.0


def grpo_outcome_advantage(
    token_level_rewards: jnp.ndarray,  # [B, T]
    eos_mask: jnp.ndarray,  # [B, T]
    index: jnp.ndarray,  # int[B] prompt-group ids in [0, num_groups)
    num_groups: int,
    epsilon: float = 1e-6,
):
    """Per-prompt-group z-scored outcome reward broadcast over response
    tokens.  Groups of size 1 use mean 0 / std 1 (reference quirk,
    rl_base.py:66-74).  Returns (advantages, returns), both [B, T]."""
    scores = jnp.sum(token_level_rewards, axis=-1)  # [B]
    ones = jnp.ones_like(scores)
    cnt = jax.ops.segment_sum(ones, index, num_groups)
    s1 = jax.ops.segment_sum(scores, index, num_groups)
    s2 = jax.ops.segment_sum(scores**2, index, num_groups)
    cnt_safe = jnp.maximum(cnt, 1.0)
    mean = s1 / cnt_safe
    # torch.std is Bessel-corrected (n-1 denominator)
    var = jnp.maximum(0.0, (s2 - cnt * mean**2) / jnp.maximum(cnt - 1.0, 1.0))
    std = jnp.sqrt(var)
    single = cnt <= 1.0
    mean = jnp.where(single, 0.0, mean)
    std = jnp.where(single, 1.0, std)
    z = (scores - mean[index]) / (std[index] + epsilon)
    adv = z[:, None] * eos_mask.astype(z.dtype)
    return adv, adv


def ppo_clip_loss(
    old_log_prob: jnp.ndarray,  # [B, T]
    log_prob: jnp.ndarray,  # [B, T]
    advantages: jnp.ndarray,  # [B, T]
    eos_mask: jnp.ndarray,  # [B, T]
    clip_ratio_low: float = 0.2,
    clip_ratio_high: float = 0.28,
):
    """Asymmetric PPO-clip (rl_base.py:170-199).  Returns
    (pg_loss, clip_frac, approx_kl)."""
    mask = eos_mask.astype(jnp.float32)

    def masked_mean(x):
        return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    neg_kl = log_prob - old_log_prob
    ratio = jnp.exp(neg_kl)
    ppo_kl = masked_mean(-neg_kl)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - clip_ratio_low, 1.0 + clip_ratio_high)
    pg_loss = masked_mean(jnp.maximum(pg1, pg2))
    clip_frac = masked_mean((pg2 > pg1).astype(jnp.float32))
    return pg_loss, clip_frac, ppo_kl


def outcome_token_rewards(
    success: jnp.ndarray,  # float[B] binary episode success
    finish_steps: jnp.ndarray,  # int[B] env steps taken
    tokens_per_step: int,
    max_tokens: int,
    reward_coef: float = 5.0,
) -> jnp.ndarray:
    """Binary success x reward_coef placed at the last valid response token
    (RobRewardManager, rl_trainer.py:213-247)."""
    B = success.shape[0]
    last = jnp.clip(finish_steps * tokens_per_step - 1, 0, max_tokens - 1)
    rewards = jnp.zeros((B, max_tokens), jnp.float32)
    return rewards.at[jnp.arange(B), last].set(reward_coef * success.astype(jnp.float32))


def response_mask(finish_steps: jnp.ndarray, tokens_per_step: int, max_tokens: int):
    """eos mask: 1 for tokens belonging to executed steps."""
    idx = jnp.arange(max_tokens)[None, :]
    return (idx < (finish_steps * tokens_per_step)[:, None]).astype(jnp.float32)


def accuracy_filter(
    success: jnp.ndarray, index: jnp.ndarray, num_groups: int,
    low: float = 0.0, high: float = 1.0,
):
    """Keep groups whose mean accuracy is strictly inside (low, high) — drops
    all-success / all-fail prompt groups that carry no GRPO signal
    (simplevla_rl_exp.py:677-700 behavior).  Returns bool[B] keep mask."""
    cnt = jax.ops.segment_sum(jnp.ones_like(success), index, num_groups)
    acc = jax.ops.segment_sum(success, index, num_groups) / jnp.maximum(cnt, 1.0)
    keep_group = (acc > low) & (acc < high)
    return keep_group[index]
