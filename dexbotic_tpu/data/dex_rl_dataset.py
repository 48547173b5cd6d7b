"""RL env-config dataset + buffered loader (reference parity).

Re-implements the reference's DexRLDataset/BufferedRLDataLoader
(/root/reference/dexbotic/data/dataset/dex_rl_dataset.py:65-419) for the JAX
multi-process world: the dataset enumerates every (task_id, trial_id) env
configuration of a suite as one epoch; the loader shuffles per-epoch with a
deterministic seed, slices the shuffled order across processes (the
DistributedSampler contract — each process sees a disjoint, equally-sized
slice, padded cyclically unless drop_last), interleaves each config
``env_dup`` times consecutively, and carries an experience buffer.

GRPO grouping: each base config in a batch is one prompt group; the exp asks
for ``n_sample`` rollouts per group (reference get_batch_env_configs,
dex_rl_dataset.py:357-386).
"""

from __future__ import annotations

import dataclasses
import uuid
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    """One environment configuration (reference base config dict,
    dex_rl_dataset.py:168-186)."""

    env_type: str
    task_suite_name: str
    task_name: str
    task_id: int
    trial_id: int
    trial_seed: int = -1
    data_source: str = ""
    uid: str = ""


class DexRLDataset:
    """Enumerates base env configurations: every task x trial of a suite.

    No shuffle / no n_sample here — that is the loader's job (same separation
    of concerns as the reference, dex_rl_dataset.py:66-76).
    """

    def __init__(
        self,
        task_names: list[str],
        num_trials_per_task: int = 50,
        env_type: str = "libero",
        task_suite_name: str = "",
    ):
        assert num_trials_per_task > 0
        self.configs: list[EnvSpec] = []
        for task_id, task in enumerate(task_names):
            for trial in range(num_trials_per_task):
                self.configs.append(
                    EnvSpec(
                        env_type=env_type,
                        task_suite_name=task_suite_name or task,
                        task_name=task,
                        task_id=task_id,
                        trial_id=trial,
                        data_source=f"{task}_task_{task_id}_trial_{trial}",
                        uid=str(uuid.uuid5(uuid.NAMESPACE_OID, f"{task}/{task_id}/{trial}")),
                    )
                )

    def __len__(self) -> int:
        return len(self.configs)

    def __getitem__(self, idx: int) -> EnvSpec:
        return self.configs[idx]


class BufferedRLDataLoader:
    """Epoch iteration over env configs with per-process slicing, env_dup
    interleaving, and an experience buffer.

    Each process's batch is ``batch_size`` base configs, each repeated
    ``env_dup`` times consecutively ([c0, c0, c1, c1, ...] — the reference's
    _apply_n_sample_interleaving repeat_interleave pattern,
    dex_rl_dataset.py:312-356)."""

    def __init__(
        self,
        dataset: DexRLDataset,
        batch_size: int,
        env_dup: int = 1,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 42,
        rank: int | None = None,
        world_size: int | None = None,
    ):
        if rank is None or world_size is None:
            try:
                import jax

                rank = jax.process_index() if rank is None else rank
                world_size = jax.process_count() if world_size is None else world_size
            except Exception:  # noqa: BLE001 (jax not initialized)
                rank, world_size = rank or 0, world_size or 1
        assert 0 <= rank < world_size
        self.dataset = dataset
        self.batch_size = batch_size
        self.env_dup = env_dup
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.epoch = 0
        self.buffer: list[Any] = []

    # -- sampling order ----------------------------------------------------

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch (DistributedSampler
        set_epoch contract)."""
        self.epoch = epoch

    def _rank_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        if self.drop_last:
            per_rank = n // self.world_size
            order = order[: per_rank * self.world_size]
        else:
            # pad cyclically so every rank gets the same number of samples
            per_rank = -(-n // self.world_size)
            pad = per_rank * self.world_size - n
            if pad:
                order = np.concatenate([order, order[:pad]])
        return order[self.rank :: self.world_size]

    @property
    def num_batches(self) -> int:
        per_rank = len(self._rank_indices())
        if self.drop_last:
            return per_rank // self.batch_size
        return -(-per_rank // self.batch_size)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self):
        idx = self._rank_indices()
        for b in range(self.num_batches):
            base = [self.dataset[i] for i in idx[b * self.batch_size : (b + 1) * self.batch_size]]
            # interleave: each base config env_dup times consecutively
            yield [spec for spec in base for _ in range(self.env_dup)]

    # -- experience buffer (reference dex_rl_dataset.py:398-419) -----------

    def add_to_buffer(self, experience) -> None:
        self.buffer.append(experience)

    def get_buffer_size(self) -> int:
        return len(self.buffer)

    def clear_buffer(self) -> None:
        self.buffer.clear()

    def sample_from_buffer(self, sample_size: int, rng: np.random.Generator | None = None):
        if sample_size >= len(self.buffer):
            return list(self.buffer)
        rng = rng or np.random.default_rng()
        idx = rng.choice(len(self.buffer), sample_size, replace=False)
        return [self.buffer[i] for i in idx]
