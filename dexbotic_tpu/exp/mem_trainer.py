"""Episode-ordered batch scheduling for memory training.

Reimplements the reference's _EpisodeScheduleBuilder / EpisodeBatchSampler
(/root/reference/dexbotic/exp/mem_trainer.py:92-360): batches preserve
in-episode frame order so the memory bank sees frames sequentially.

Modes:
  * 'stream': one episode at a time, frames in order, batch = consecutive
    frames of the same episode.
  * 'group': each batch holds `group_size` consecutive frames of one episode.
  * 'parallel_stream': B parallel episode streams; batch i holds frame i of
    B different episodes (the TPU-native default — maps to vmapped bank
    state with per-row resets).

Host-shard with `shard`/`num_shards` (the DDP eps[rank::world] split).
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Iterator


def build_episode_index(dataset) -> dict:
    """episode key (ds_idx, file_idx) -> ordered list of dataset indices."""
    eps = defaultdict(list)
    for i, (ds, f, frame) in enumerate(dataset.global_index):
        eps[(ds, f)].append((frame, i))
    return {k: [i for _, i in sorted(v)] for k, v in eps.items()}


def episode_batches(
    dataset,
    batch_size: int,
    mode: str = "parallel_stream",
    group_size: int = 8,
    seed: int = 42,
    shard: int = 0,
    num_shards: int = 1,
) -> Iterator[list]:
    """Yields lists of (dataset_index, is_episode_start) per batch."""
    eps = build_episode_index(dataset)
    keys = sorted(eps.keys())
    rng = random.Random(seed)
    rng.shuffle(keys)
    keys = keys[shard::num_shards]

    if mode == "stream":
        for k in keys:
            idxs = eps[k]
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s : s + batch_size]
                yield [(i, (s + j) == 0) for j, i in enumerate(chunk)]
    elif mode == "group":
        for k in keys:
            idxs = eps[k]
            for s in range(0, len(idxs), group_size):
                chunk = idxs[s : s + group_size]
                yield [(i, (s + j) == 0) for j, i in enumerate(chunk)]
    elif mode == "parallel_stream":
        # B parallel streams; refill a stream with the next episode when done
        queue = list(keys)
        streams = [None] * batch_size  # each: (iter over idxs, started)
        while True:
            batch = []
            for b in range(batch_size):
                if streams[b] is None or streams[b][1] >= len(streams[b][0]):
                    if not queue:
                        return
                    streams[b] = [eps[queue.pop(0)], 0]
                    batch.append((streams[b][0][0], True))
                    streams[b][1] = 1
                else:
                    idxs, pos = streams[b]
                    batch.append((idxs[pos], False))
                    streams[b][1] = pos + 1
            yield batch
    else:
        raise ValueError(mode)


def length_grouped_batches(
    lengths: list[int],
    batch_size: int,
    seed: int = 42,
    group_factor: int = 8,
):
    """Length-grouped shuffled batches (NaVILA's LongVILADistributedSampler,
    exp/navila_trainer.py:64-208): sort into length-similar mega-groups,
    shuffle within, emit batches of similar-length samples so packing /
    padding waste stays low.  Yields lists of dataset indices."""
    import random as _random

    rng = _random.Random(seed)
    order = sorted(range(len(lengths)), key=lambda i: lengths[i])
    mega = batch_size * group_factor
    batches = []
    for s in range(0, len(order), mega):
        group = order[s : s + mega]
        rng.shuffle(group)
        for b in range(0, len(group) - batch_size + 1, batch_size):
            batches.append(group[b : b + batch_size])
    rng.shuffle(batches)
    return batches
