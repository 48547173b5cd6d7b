"""SimpleVLA-RL (GRPO) trainer: rollout collection, filtering, policy update.

Loop pinned to /root/reference/dexbotic/exp/simplevla_rl_exp.py:524-830 and
exp/rl/rl_trainer.py: env batches -> chunked sampled rollouts with the
OFT-Discrete actor (per-step log-prob capture) -> binary success reward ->
accuracy filter -> redistribution -> PPO-clip update with GRPO advantages
and an entropy bonus.  Envs and filtering stay on host (irregular control
flow); rollout tensors are fixed-shape [N, max_steps, ...] pad+mask so the
update is one SPMD program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dexbotic_tpu.exp.rl.grpo import (
    GRPOConfig,
    accuracy_filter,
    grpo_outcome_advantage,
    outcome_token_rewards,
    ppo_clip_loss,
    response_mask,
)
from dexbotic_tpu.models.oft import OFTConfig, oft_action_log_probs, oft_generate_action


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    max_env_steps: int = 512  # total env steps budget per episode
    chunk_steps: int = 8  # env steps executed per model call
    temperature: float = 1.6
    accuracy_lower_bound: float = 0.0
    accuracy_upper_bound: float = 1.0


class RolloutBuffer:
    """Fixed-shape per-episode storage of per-chunk (obs, action, logp)."""

    def __init__(self, num_envs: int, max_chunks: int, obs_shapes: dict, tokens_per_chunk: int):
        self.n = num_envs
        self.max_chunks = max_chunks
        self.obs = {
            k: np.zeros((num_envs, max_chunks) + tuple(shape), np.float32)
            for k, shape in obs_shapes.items()
        }
        self.input_ids = None  # [N, L] prompt ids (constant per episode)
        self.prompt_valid = None
        self.bins = np.zeros((num_envs, max_chunks, tokens_per_chunk), np.int32)
        self.old_logp = np.zeros((num_envs, max_chunks, tokens_per_chunk), np.float32)
        self.chunk_count = np.zeros(num_envs, np.int32)
        self.success = np.zeros(num_envs, np.float32)
        self.group_index = np.zeros(num_envs, np.int32)


def collect_rollouts(
    envs: list,
    actor_fn: Callable,  # (obs_batch dict, rng) -> (actions [N,chunk,dim], bins, logp, input_ids, prompt_valid, images)
    rollout_cfg: RolloutConfig,
    rng: jax.Array,
    group_index: Optional[np.ndarray] = None,
) -> RolloutBuffer:
    """Run all envs to completion (or budget) in lock-step chunks.

    Finished envs keep receiving (masked) actions host-side but are not
    stepped — fixed shapes for SPMD, irregular lifetimes on host
    (simplevla_rl_exp.py:1510-1583)."""
    n = len(envs)
    max_chunks = rollout_cfg.max_env_steps // rollout_cfg.chunk_steps
    obs_list = [e.get_obs() for e in envs]
    instructions = [e.get_instruction() for e in envs]

    buf = None
    for chunk in range(max_chunks):
        rng, r = jax.random.split(rng)
        actions, bins, logp, input_ids, prompt_valid, images = actor_fn(
            obs_list, instructions, r
        )
        if buf is None:
            buf = RolloutBuffer(
                n, max_chunks,
                obs_shapes={"images": images.shape[1:]},
                tokens_per_chunk=bins.shape[-1],
            )
            buf.input_ids = np.asarray(input_ids)
            buf.prompt_valid = np.asarray(prompt_valid)
            if group_index is not None:
                buf.group_index = np.asarray(group_index, np.int32)
        actions_np = np.asarray(actions)
        any_active = False
        for i, env in enumerate(envs):
            if not env.is_active():
                continue
            any_active = True
            buf.obs["images"][i, chunk] = np.asarray(images[i])
            buf.bins[i, chunk] = np.asarray(bins[i])
            buf.old_logp[i, chunk] = np.asarray(logp[i])
            buf.chunk_count[i] += 1
            chunk_actions = actions_np[i][: rollout_cfg.chunk_steps]
            obs, done = env.step(chunk_actions)
            if done:
                buf.success[i] = float(env.is_complete())
            else:
                obs_list[i] = obs
        if not any_active:
            break
    for i, env in enumerate(envs):
        if env.is_active():  # budget exhausted
            buf.success[i] = float(env.is_complete())
    return buf


def flatten_rollouts(buf: RolloutBuffer) -> dict:
    """[N, C, ...] chunk storage -> flat training arrays with masks."""
    N, C, T = buf.bins.shape
    chunk_valid = (np.arange(C)[None, :] < buf.chunk_count[:, None]).astype(np.float32)
    return {
        "images": buf.obs["images"].reshape((N * C,) + buf.obs["images"].shape[2:]),
        "input_ids": np.repeat(buf.input_ids, C, axis=0),
        "prompt_valid": np.repeat(buf.prompt_valid, C, axis=0),
        "bins": buf.bins.reshape(N * C, T),
        "old_logp": buf.old_logp.reshape(N * C, T),
        "chunk_valid": chunk_valid.reshape(N * C),
        "episode": np.repeat(np.arange(N), C),
        "success": np.repeat(buf.success, C),
        "group_index": np.repeat(buf.group_index, C),
    }


def allgather_rollouts(buf: RolloutBuffer, pad_prompt_to: Optional[int] = None) -> RolloutBuffer:
    """Concatenate every process's rollout buffer into one global buffer.

    The multi-host rollout exchange (reference: dist.all_gather of filtered
    GRPO samples, exp/rl/rl_rollout_redis.py:17-110): each host collects its
    own env episodes, then all hosts see the union, so the accuracy filter,
    redistribution, and policy update are computed identically everywhere —
    replicas stay in sync without explicit grad collectives.  No-op when
    single-process.  pad_prompt_to right-pads input_ids/prompt_valid to a
    common length (per-host prompt batches may have different max lengths)."""
    if jax.process_count() == 1:
        return buf
    from dexbotic_tpu.parallel import multihost

    if pad_prompt_to is not None and buf.input_ids.shape[1] < pad_prompt_to:
        pad = pad_prompt_to - buf.input_ids.shape[1]
        buf.input_ids = np.pad(buf.input_ids, ((0, 0), (0, pad)))
        buf.prompt_valid = np.pad(buf.prompt_valid, ((0, 0), (0, pad)))
    g = RolloutBuffer.__new__(RolloutBuffer)
    g.n = buf.n * jax.process_count()
    g.max_chunks = buf.max_chunks
    g.obs = {k: np.asarray(multihost.allgather(v)) for k, v in buf.obs.items()}
    for name in ("input_ids", "prompt_valid", "bins", "old_logp",
                 "chunk_count", "success", "group_index"):
        setattr(g, name, np.asarray(multihost.allgather(getattr(buf, name))))
    return g


def filter_and_redistribute(
    buf: RolloutBuffer, grpo_cfg: GRPOConfig, rollout_cfg: RolloutConfig, num_groups: int
) -> np.ndarray:
    """Host-side accuracy filter + circular redistribution of surviving
    episode indices to the original count (exp/rl/rl_rollout_redis.py:17-110
    semantics; single-host variant — multi-host uses process_allgather)."""
    keep = np.asarray(
        accuracy_filter(
            jnp.asarray(buf.success), jnp.asarray(buf.group_index), num_groups,
            rollout_cfg.accuracy_lower_bound, rollout_cfg.accuracy_upper_bound,
        )
    )
    kept = np.nonzero(keep)[0]
    if len(kept) == 0:
        return np.arange(len(buf.success))  # nothing survives: keep all
    reps = int(np.ceil(len(buf.success) / len(kept)))
    return np.tile(kept, reps)[: len(buf.success)]


def rl_policy_loss(
    params,
    oft_cfg: OFTConfig,
    grpo_cfg: GRPOConfig,
    batch: dict,
    temperature: float = 1.0,
):
    """PPO-clip + entropy on recomputed log-probs (rl_trainer.py:537-735)."""
    logp, entropy = oft_action_log_probs(
        params, oft_cfg, batch["input_ids"], batch["prompt_valid"], batch["images"],
        batch.get("states"), batch["bins"], temperature=temperature,
    )
    mask = batch["token_mask"].astype(jnp.float32)
    pg_loss, clip_frac, approx_kl = ppo_clip_loss(
        batch["old_logp"], logp, batch["advantages"], mask,
        grpo_cfg.clip_ratio_low, grpo_cfg.clip_ratio_high,
    )
    ent = jnp.sum(entropy * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    loss = pg_loss - grpo_cfg.entropy_coeff * ent
    return loss, {
        "pg_loss": pg_loss, "clip_frac": clip_frac, "approx_kl": approx_kl,
        "entropy": ent, "loss": loss,
    }


def prepare_update_batch(flat: dict, grpo_cfg: GRPOConfig, num_groups: int) -> dict:
    """Token rewards -> GRPO advantages over the flattened chunk samples."""
    T = flat["bins"].shape[-1]
    # each chunk sample carries the episode outcome at its last token
    success = jnp.asarray(flat["success"]) * jnp.asarray(flat["chunk_valid"])
    rewards = jnp.zeros((success.shape[0], T), jnp.float32)
    rewards = rewards.at[:, -1].set(grpo_cfg.reward_coef * success)
    token_mask = jnp.broadcast_to(
        jnp.asarray(flat["chunk_valid"])[:, None], rewards.shape
    )
    adv, _ = grpo_outcome_advantage(
        rewards, token_mask, jnp.asarray(flat["group_index"]), num_groups,
        grpo_cfg.epsilon,
    )
    return {
        "input_ids": jnp.asarray(flat["input_ids"]),
        "prompt_valid": jnp.asarray(flat["prompt_valid"]),
        "images": jnp.asarray(flat["images"]),
        "bins": jnp.asarray(flat["bins"]),
        "old_logp": jnp.asarray(flat["old_logp"]),
        "advantages": adv,
        "token_mask": token_mask,
    }


class GRPOUpdater:
    """Micro-batched PPO update (optax; reuse across steps)."""

    def __init__(self, oft_cfg: OFTConfig, grpo_cfg: GRPOConfig, params,
                 learning_rate: float = 1e-6, max_grad_norm: float = 1.0,
                 temperature: float = 1.0):
        self.oft_cfg = oft_cfg
        self.grpo_cfg = grpo_cfg
        self.temperature = temperature
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(learning_rate),
        )
        self.opt_state = self.tx.init(params)

        def step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: rl_policy_loss(p, oft_cfg, grpo_cfg, batch, self.temperature),
                has_aux=True,
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def update(self, params, batch: dict, micro_batch_size: int):
        n = batch["bins"].shape[0]
        all_metrics = []
        for s in range(0, n - micro_batch_size + 1, micro_batch_size):
            mb = {k: v[s : s + micro_batch_size] for k, v in batch.items()}
            params, self.opt_state, metrics = self._step(params, self.opt_state, mb)
            all_metrics.append({k: float(v) for k, v in metrics.items()})
        agg = {
            k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]
        } if all_metrics else {}
        return params, agg
