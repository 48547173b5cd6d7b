"""SimpleVLA-RL experiment: GRPO post-training of the OFT-Discrete actor.

Loop pinned to /root/reference/dexbotic/exp/simplevla_rl_exp.py:524-830:
env batches from an interleaved task sampler -> chunked sampled rollouts with
per-step log-prob capture -> binary success reward -> accuracy filter ->
circular redistribution -> PPO-clip update with GRPO advantages.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexbotic_tpu.constants import IMAGE_TOKEN_INDEX
from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.oft_exp import OFTModelConfig
from dexbotic_tpu.exp.rl.grpo import GRPOConfig
from dexbotic_tpu.exp.rl.rl_trainer import (
    GRPOUpdater,
    RolloutConfig,
    allgather_rollouts,
    collect_rollouts,
    filter_and_redistribute,
    flatten_rollouts,
    prepare_update_batch,
)
from dexbotic_tpu.models.oft import oft_generate_action
from dexbotic_tpu.parallel.mesh import make_mesh
from dexbotic_tpu.sim_envs.base import extract_rgb
from dexbotic_tpu.sim_envs.factory import create_env_batch
from dexbotic_tpu.tokenization.tokenize import tokenizer_image_token


@dataclass
class RLEnvConfig(base_exp.Config):
    env_type: str = "mock"  # 'mock' | 'libero'
    task_suite_name: str = "libero_spatial"
    task_names: tuple = ("task_0",)
    num_envs: int = 8
    max_episode_steps: int = 512
    obs_dim: tuple = (224, 224, 3)
    camera_height: int = 256
    camera_width: int = 256
    mock_success_prob: float = 0.5


@dataclass
class RLDataLoaderConfig(base_exp.Config):
    """BufferedRLDataLoader surface (reference dex_rl_dataset.py:65-419).

    schedule='random' draws tasks uniformly each step; schedule='epoch'
    enumerates every (task, trial) config of the suite per epoch through
    data/dex_rl_dataset.py's BufferedRLDataLoader (per-epoch seeded shuffle,
    per-process disjoint slices, env_dup interleaving) — the reference's
    sampling contract."""

    n_samples: int = 8  # rollouts per prompt group (GRPO)
    schedule: str = "random"  # 'random' | 'epoch'
    num_trials_per_task: int = 50
    env_dup: int = 1
    drop_last: bool = False

    def sample_env_batch(self, env_cfg: RLEnvConfig, rng: np.random.Generator):
        n_groups = max(1, env_cfg.num_envs // self.n_samples)
        tasks, trials, seeds, groups = [], [], [], []
        for g in range(n_groups):
            task = env_cfg.task_names[int(rng.integers(len(env_cfg.task_names)))]
            for s in range(self.n_samples):
                tasks.append(task)
                trials.append(g * self.n_samples + s)
                seeds.append(int(rng.integers(1 << 30)))
                groups.append(g)
        return tasks, trials, seeds, np.asarray(groups), n_groups

    def build_loader(self, env_cfg: RLEnvConfig, seed: int):
        from dexbotic_tpu.data.dex_rl_dataset import (
            BufferedRLDataLoader,
            DexRLDataset,
        )

        ds = DexRLDataset(
            list(env_cfg.task_names),
            num_trials_per_task=self.num_trials_per_task,
            env_type=env_cfg.env_type,
            task_suite_name=env_cfg.task_suite_name,
        )
        n_groups = max(1, env_cfg.num_envs // self.n_samples)
        return BufferedRLDataLoader(
            ds, batch_size=n_groups, env_dup=self.env_dup,
            drop_last=self.drop_last, seed=seed,
        )

    def expand_groups(self, base_specs, rng: np.random.Generator):
        """Loader batch (base EnvSpecs) -> (tasks, trials, seeds, groups,
        n_groups): each spec is one GRPO prompt group rolled out n_samples
        times with distinct episode seeds (reference get_batch_env_configs,
        dex_rl_dataset.py:357-386)."""
        tasks, trials, seeds, groups = [], [], [], []
        for g, spec in enumerate(base_specs):
            for _ in range(self.n_samples):
                tasks.append(spec.task_name)
                trials.append(spec.trial_id)
                seeds.append(int(rng.integers(1 << 30)))
                groups.append(g)
        return tasks, trials, seeds, np.asarray(groups), len(base_specs)


@dataclass
class SimpleVLARLExp(base_exp.BaseExp):
    exp_name: str = "simplevla_rl"
    model: OFTModelConfig = field(
        default_factory=lambda: OFTModelConfig(action_model_type="Discrete")
    )
    env: RLEnvConfig = field(default_factory=RLEnvConfig)
    rl_data: RLDataLoaderConfig = field(default_factory=RLDataLoaderConfig)
    grpo: GRPOConfig = field(default_factory=lambda: GRPOConfig(entropy_coeff=0.001))
    rollout: RolloutConfig = field(default_factory=RolloutConfig)
    rl_epochs: int = 1
    rl_steps_per_epoch: int = 4
    micro_batch_size: int = 8
    rl_learning_rate: float = 1e-6
    prompt_text_len: int = 16

    def _make_actor(self, cfg, params, tokenizer):
        nt = cfg.vlm.num_image_tokens
        proc = self.data.build_image_processor()

        gen = jax.jit(
            lambda params, ids, valid, imgs, r: oft_generate_action(
                params, cfg, ids, valid, imgs, None, r,
                temperature=self.rollout.temperature,
            )
        )

        def actor_fn(obs_list, instructions, rng):
            from dexbotic_tpu.data.image_processing import preprocess_image

            B = len(obs_list)
            # backend-agnostic frame extraction (mock/robotwin nested dicts
            # AND libero's flat agentview keys incl. its vertical flip)
            imgs = np.stack(
                [preprocess_image(extract_rgb(o), proc) for o in obs_list]
            )[:, None]
            L = nt + self.prompt_text_len
            ids = np.zeros((B, L), np.int64)
            valid = np.zeros((B, L), bool)
            for i, inst in enumerate(instructions):
                text = tokenizer_image_token(f"<image>\n{inst}", tokenizer, num_image_tokens=nt)
                text = text[:L]
                ids[i, : len(text)] = text
                valid[i, : len(text)] = True
            actions, bins, logp = gen(
                params, jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(imgs), rng
            )
            return actions, bins, logp, ids, valid, imgs[:, 0]

        return actor_fn

    def train_rl(self):
        cfg = self.model.build_config()
        params = self.model.build_params(cfg)
        tokenizer = self.tokenizer.build_tokenizer()
        # sharded PPO update: params/moments fsdp over the mesh (the GSPMD
        # analogue of the reference's DeepSpeed RL training, docs/RL.md:47-51)
        import math

        data = self.trainer.mesh_data
        if data is None:
            # largest data-parallel size the micro-batch can shard over
            data = math.gcd(
                len(jax.devices()) // self.trainer.mesh_model, self.micro_batch_size
            ) or 1
        mesh = make_mesh(data=data, model=self.trainer.mesh_model)
        updater = GRPOUpdater(
            cfg, self.grpo, params,
            learning_rate=self.rl_learning_rate,
            temperature=self.rollout.temperature,
            mesh=mesh,
        )
        params = updater.shard_params(params)
        # multi-host: each process rolls out its own env batch (distinct
        # seeds/tasks), then buffers are allgathered so the filter and the
        # update are computed identically everywhere (replicas stay in sync)
        pid, nproc = jax.process_index(), jax.process_count()
        host_rng = np.random.default_rng(self.trainer.seed + pid)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.trainer.seed), pid)
        loader = (
            self.rl_data.build_loader(self.env, self.trainer.seed)
            if self.rl_data.schedule == "epoch"
            else None
        )
        history = []
        for epoch in range(self.rl_epochs):
            if loader is not None:
                loader.set_epoch(epoch)
                batches = iter(loader)
            for step in range(self.rl_steps_per_epoch):
                if loader is not None:
                    try:
                        base = next(batches)
                    except StopIteration:
                        batches = iter(loader)
                        base = next(batches)
                    tasks, trials, seeds, groups, n_groups = self.rl_data.expand_groups(
                        base, host_rng
                    )
                else:
                    tasks, trials, seeds, groups, n_groups = self.rl_data.sample_env_batch(
                        self.env, host_rng
                    )
                groups = np.asarray(groups) + pid * n_groups  # globally unique
                envs = create_env_batch(
                    self.env.env_type, self.env.task_suite_name, tasks, trials,
                    seeds, self.env, threaded=self.env.env_type != "mock",
                )
                rng, r = jax.random.split(rng)
                # per-phase wall timers, the analogue of the reference's
                # codetiming.Timer around gen/verify/filter
                # (simplevla_rl_exp.py:602-660); reported as timing/<phase>_s
                timing: dict = {}
                t0 = time.perf_counter()
                actor = self._make_actor(cfg, params, tokenizer)
                buf = collect_rollouts(envs, actor, self.rollout, r, group_index=groups)
                for e in envs:
                    e.close()
                timing["gen"] = time.perf_counter() - t0

                t0 = time.perf_counter()
                buf = allgather_rollouts(
                    buf, pad_prompt_to=self.tokenizer.model_max_length
                )
                n_groups = n_groups * nproc
                idx, new_groups = filter_and_redistribute(
                    buf, self.grpo, self.rollout, n_groups
                )
                timing["filter"] = time.perf_counter() - t0
                # reorder episodes by the redistributed indices, then flatten
                buf.obs = {k: v[idx] for k, v in buf.obs.items()}
                buf.bins = buf.bins[idx]
                buf.old_logp = buf.old_logp[idx]
                buf.chunk_count = buf.chunk_count[idx]
                buf.success = buf.success[idx]
                buf.truncated = buf.truncated[idx]
                buf.group_index = new_groups
                buf.input_ids = buf.input_ids[idx]
                buf.prompt_valid = buf.prompt_valid[idx]
                flat = flatten_rollouts(buf)
                batch = prepare_update_batch(
                    flat, self.grpo, n_groups,
                    episode_success=buf.success, episode_group=buf.group_index,
                )
                t0 = time.perf_counter()
                params, metrics = updater.update(params, batch, self.micro_batch_size)
                timing["update"] = time.perf_counter() - t0
                # aggregated RL metrics over the (already allgathered, hence
                # globally identical) rollout set — reference all_reduces the
                # same set (simplevla_rl_exp.py:1020)
                metrics["success_rate"] = float(buf.success.mean())
                metrics["truncated_frac"] = float(buf.truncated.mean())
                metrics["num_rollouts"] = int(buf.success.shape[0])
                metrics["mean_chunks_per_episode"] = float(buf.chunk_count.mean())
                for k, v in timing.items():
                    metrics[f"timing/{k}_s"] = round(v, 3)
                metrics["epoch"] = epoch
                metrics["step"] = step
                history.append(metrics)
                if pid == 0:
                    print(metrics)
        return params, history


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="train", choices=["train"])
    parser.parse_known_args()
    SimpleVLARLExp().train_rl()
