"""Smoke tests for the remaining exp specializations (tiny configs)."""

import dataclasses

import jax
import numpy as np
import pytest

from dexbotic_tpu.exp import base_exp
from dexbotic_tpu.exp.mem_trainer import build_episode_index, episode_batches
from dexbotic_tpu.exp.oft_exp import OFTExp, OFTModelConfig
from dexbotic_tpu.exp.rl.grpo import GRPOConfig
from dexbotic_tpu.exp.rl.rl_trainer import RolloutConfig
from dexbotic_tpu.exp.simplevla_rl_exp import RLDataLoaderConfig, RLEnvConfig, SimpleVLARLExp
from dexbotic_tpu.exp.trainer import TrainerConfig


class _FakeDataset:
    """Minimal dataset exposing global_index for the schedule builder."""

    def __init__(self):
        self.global_index = []
        for f, n in ((0, 5), (1, 3), (2, 4)):
            for frame in range(n):
                self.global_index.append((0, f, frame))


def test_episode_index_and_stream_schedule():
    ds = _FakeDataset()
    eps = build_episode_index(ds)
    assert len(eps) == 3 and len(eps[(0, 0)]) == 5

    batches = list(episode_batches(ds, batch_size=2, mode="stream", seed=0))
    # frames in-order within each episode; first frame flagged as start
    flat = [x for b in batches for x in b]
    assert sum(start for _, start in flat) == 3  # one start per episode
    # order within an episode preserved
    idxs = [i for i, _ in flat]
    frames = [ds.global_index[i] for i in idxs]
    by_ep = {}
    for d, f, fr in frames:
        by_ep.setdefault(f, []).append(fr)
    for f, frs in by_ep.items():
        assert frs == sorted(frs)


def test_parallel_stream_schedule():
    ds = _FakeDataset()
    batches = list(episode_batches(ds, batch_size=2, mode="parallel_stream", seed=0))
    assert all(len(b) == 2 for b in batches)
    total = sum(len(b) for b in batches)
    assert total >= 8  # most frames consumed (tail episodes may be dropped)


def test_simplevla_rl_mock_loop():
    """One tiny GRPO step on the mock env through the exp surface."""
    exp = SimpleVLARLExp(
        model=OFTModelConfig(
            llm_preset="test", vit_preset="test", action_model_type="Discrete",
            action_dim=3, chunk_size=4, num_bins=32,
        ),
        data=base_exp.DataConfig(image_processor="28"),
        env=RLEnvConfig(env_type="mock", num_envs=4, max_episode_steps=8,
                        obs_dim=(28, 28, 3)),
        rl_data=RLDataLoaderConfig(n_samples=2),
        rollout=RolloutConfig(max_env_steps=8, chunk_steps=4, temperature=1.0),
        grpo=GRPOConfig(entropy_coeff=0.001),
        rl_epochs=1,
        rl_steps_per_epoch=1,
        micro_batch_size=4,
        prompt_text_len=8,
        trainer=TrainerConfig(seed=0),
    )
    params, history = exp.train_rl()
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert 0.0 <= history[0]["success_rate"] <= 1.0
