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
    # drop prompt groups containing an episode that exhausted the step budget
    # (reference filter_truncated, simplevla_rl_exp.py:329 + :1183-1199)
    filter_truncated: bool = False


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
        self.truncated = np.zeros(num_envs, np.float32)  # hit budget, never done
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
            buf.truncated[i] = 1.0
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

    # process_allgather needs identical shapes on every process, but
    # per-process episode counts can differ (crashed envs, uneven group
    # assignment): exchange counts, right-pad every per-episode array to the
    # global max, gather, then compact the padding back out — identical on
    # all hosts, so the downstream filter/redistribute stays replicated.
    counts = np.asarray(multihost.allgather(np.asarray([buf.n], np.int32))).reshape(-1)
    n_max = int(counts.max())

    def pad_rows(a):
        if a.shape[0] == n_max:
            return a
        return np.pad(a, [(0, n_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1))

    # rows gathered as [P * n_max, ...]; keep [p * n_max : p * n_max + counts[p]]
    keep = np.concatenate(
        [p * n_max + np.arange(c) for p, c in enumerate(counts)]
    )
    g = RolloutBuffer.__new__(RolloutBuffer)
    g.n = int(counts.sum())
    g.max_chunks = buf.max_chunks
    g.obs = {
        k: np.asarray(multihost.allgather(pad_rows(v)))[keep]
        for k, v in buf.obs.items()
    }
    for name in ("input_ids", "prompt_valid", "bins", "old_logp",
                 "chunk_count", "success", "truncated", "group_index"):
        setattr(g, name, np.asarray(multihost.allgather(pad_rows(getattr(buf, name))))[keep])
    return g


def filter_and_redistribute(
    buf: RolloutBuffer, grpo_cfg: GRPOConfig, rollout_cfg: RolloutConfig, num_groups: int
):
    """Host-side accuracy (+ optional truncation) filter + GROUP-granular
    circular redistribution back to the original group count, with fresh
    group ids per redistributed block — the reference's filter -> circular
    redistribute -> change_uid sequence (exp/rl/rl_rollout_redis.py:17-110,
    simplevla_rl_exp.py:513-520, :1183-1199).

    Returns (episode_idx, new_group_index): reorder episode arrays by
    episode_idx and replace group_index with new_group_index before the
    GRPO update."""
    N = len(buf.success)
    keep = np.asarray(
        accuracy_filter(
            jnp.asarray(buf.success), jnp.asarray(buf.group_index), num_groups,
            rollout_cfg.accuracy_lower_bound, rollout_cfg.accuracy_upper_bound,
        )
    )
    if rollout_cfg.filter_truncated:
        # drop groups containing any truncated episode
        cnt = np.zeros(num_groups)
        np.add.at(cnt, buf.group_index, buf.truncated)
        keep = keep & (cnt[buf.group_index] == 0)
    kept_groups = np.unique(buf.group_index[keep.astype(bool)])
    if len(kept_groups) == 0:
        return np.arange(N), buf.group_index.copy()  # nothing survives: keep all
    idx_blocks, new_groups = [], []
    total = 0
    for b in range(num_groups):
        g = kept_groups[b % len(kept_groups)]
        eps = np.nonzero(buf.group_index == g)[0]
        idx_blocks.append(eps)
        new_groups.append(np.full(len(eps), b, np.int32))
        total += len(eps)
        if total >= N:
            break
    idx = np.concatenate(idx_blocks)[:N]
    new_group_index = np.concatenate(new_groups)[:N]
    return idx, new_group_index


def rl_policy_loss(
    params,
    oft_cfg: OFTConfig,
    grpo_cfg: GRPOConfig,
    batch: dict,
    temperature: float = 1.0,
    remat: bool = True,
):
    """PPO-clip + entropy on recomputed log-probs (rl_trainer.py:537-735).
    remat defaults ON — the reference's RL fine-tune always runs gradient
    checkpointing (docs/RL.md), and a 1b actor OOMs one v5e without it."""
    logp, entropy = oft_action_log_probs(
        params, oft_cfg, batch["input_ids"], batch["prompt_valid"], batch["images"],
        batch.get("states"), batch["bins"], temperature=temperature, remat=remat,
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


def prepare_update_batch(
    flat: dict,
    grpo_cfg: GRPOConfig,
    num_groups: int,
    episode_success: Optional[np.ndarray] = None,
    episode_group: Optional[np.ndarray] = None,
) -> dict:
    """Episode-level GRPO advantages broadcast to the episode's valid chunks.

    Group statistics are computed over EPISODE outcome scores — one score
    per rollout, exactly the reference's per-rollout grouping
    (rl_base.py:35-74) — never over the flattened chunk rows, so padding
    chunks don't dilute the z-score and episodes aren't weighted by their
    chunk count (ADVICE r1)."""
    T = flat["bins"].shape[-1]
    ep = np.asarray(flat["episode"])
    if episode_success is None:
        _, first = np.unique(ep, return_index=True)
        episode_success = np.asarray(flat["success"])[first]
        episode_group = np.asarray(flat["group_index"])[first]
    scores = grpo_cfg.reward_coef * jnp.asarray(episode_success, jnp.float32)
    adv_ep, _ = grpo_outcome_advantage(
        scores[:, None], jnp.ones_like(scores)[:, None],
        jnp.asarray(episode_group), num_groups, grpo_cfg.epsilon,
    )
    token_mask = jnp.broadcast_to(
        jnp.asarray(flat["chunk_valid"])[:, None],
        (flat["chunk_valid"].shape[0], T),
    )
    adv = adv_ep[jnp.asarray(ep), 0][:, None] * token_mask
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
    """Micro-batched PPO update (optax; reuse across steps).

    With `mesh`, the update runs fully sharded: params/moments fsdp over the
    'data' axis (ZeRO-3 analogue), micro-batches data-sharded — the GSPMD
    equivalent of the reference training RL under DeepSpeed
    (/root/reference/docs/RL.md:47-51); a 7B actor shards instead of OOMing."""

    def __init__(self, oft_cfg: OFTConfig, grpo_cfg: GRPOConfig, params,
                 learning_rate: float = 1e-6, max_grad_norm: float = 1.0,
                 temperature: float = 1.0, mesh=None, remat: bool = True):
        self.oft_cfg = oft_cfg
        self.grpo_cfg = grpo_cfg
        self.temperature = temperature
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(learning_rate),
        )

        def step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: rl_policy_loss(p, oft_cfg, grpo_cfg, batch,
                                         self.temperature, remat=remat),
                has_aux=True,
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        if mesh is None:
            self.param_shardings = None
            self.opt_state = self.tx.init(params)
            self._step = jax.jit(step, donate_argnums=(0, 1))
        else:
            from dexbotic_tpu.parallel.mesh import (
                batch_sharding,
                fsdp_shardings,
                tp_fsdp_shardings,
            )

            shard_fn = (
                tp_fsdp_shardings if mesh.shape.get("model", 1) > 1 else fsdp_shardings
            )
            self.param_shardings = shard_fn(params, mesh)
            params = jax.tree.map(jax.device_put, params, self.param_shardings)
            opt_abs = jax.eval_shape(self.tx.init, params)
            self.opt_shardings = shard_fn(opt_abs, mesh)
            with mesh:
                self.opt_state = jax.jit(
                    self.tx.init, out_shardings=self.opt_shardings
                )(params)
            self._step = jax.jit(
                step,
                in_shardings=(
                    self.param_shardings, self.opt_shardings, batch_sharding(mesh)
                ),
                out_shardings=(self.param_shardings, self.opt_shardings, None),
                donate_argnums=(0, 1),
            )

    def shard_params(self, params):
        """Place a host/replicated param tree onto the update mesh (no-op
        without a mesh).  Call once before the rollout/update loop."""
        if self.param_shardings is None:
            return params
        return jax.tree.map(jax.device_put, params, self.param_shardings)

    def update(self, params, batch: dict, micro_batch_size: int):
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            assert micro_batch_size % d == 0, (
                f"micro_batch_size {micro_batch_size} not divisible by "
                f"data-parallel size {d}"
            )
        n = batch["bins"].shape[0]
        pad = (-n) % micro_batch_size
        if pad:
            # Pad the tail to a full micro-batch with zero-weight repeats so
            # EVERY rollout contributes to the update (the old
            # `range(0, n - mb + 1, ...)` silently dropped the tail: with
            # n=12, mb=8, a third of the rollouts never updated the policy).
            # Repeated rows get token_mask=0 and advantages=0, so the masked
            # PPO means (grpo.py:ppo_clip_loss) ignore them exactly.
            idx = jnp.arange(pad) % n
            batch = {k: jnp.concatenate([v, jnp.take(v, idx, axis=0)], axis=0)
                     for k, v in batch.items()}
            real = (jnp.arange(n + pad) < n)[:, None]
            for k in ("token_mask", "advantages"):
                batch[k] = batch[k] * real.astype(batch[k].dtype)
            n += pad
        all_metrics = []
        for s in range(0, n, micro_batch_size):
            mb = {k: v[s : s + micro_batch_size] for k, v in batch.items()}
            params, self.opt_state, metrics = self._step(params, self.opt_state, mb)
            all_metrics.append({k: float(v) for k, v in metrics.items()})
        agg = {
            k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]
        } if all_metrics else {}
        return params, agg
