"""Prefetching data loader: threaded item fetch + device double-buffering.

Replaces the reference's torch DataLoader(num_workers=N) (SURVEY.md §3.1
"DataLoader workers (8 procs)") with a thread pool (cv2/PIL/numpy release
the GIL for the heavy work) and an N-deep device prefetch queue so host
decode overlaps TPU compute (SURVEY.md §7 'Host/device split').
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class DataLoader:
    """Shuffled epoch iterator with parallel item fetch and collation."""

    def __init__(
        self,
        dataset,
        collate_fn: Callable,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 42,
        drop_last: bool = True,
        epochs: Optional[int] = None,
    ):
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.epochs = epochs

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_stream(self) -> Iterator[list[int]]:
        rng = random.Random(self.seed)
        epoch = 0
        while self.epochs is None or epoch < self.epochs:
            order = list(range(len(self.dataset)))
            if self.shuffle:
                rng.shuffle(order)
            end = len(order) if not self.drop_last else len(order) - len(order) % self.batch_size
            for s in range(0, end, self.batch_size):
                yield order[s : s + self.batch_size]
            epoch += 1

    def __iter__(self):
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()
            idx_stream = self._index_stream()
            DEPTH = 2  # batches in flight

            def submit_next():
                try:
                    idxs = next(idx_stream)
                except StopIteration:
                    return None
                futures = [pool.submit(self.dataset.__getitem__, i) for i in idxs]
                return futures

            for _ in range(DEPTH):
                f = submit_next()
                if f is not None:
                    pending.put(f)
            while not pending.empty():
                futures = pending.get()
                batch = self.collate_fn([f.result() for f in futures])
                nxt = submit_next()
                if nxt is not None:
                    pending.put(nxt)
                yield batch


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Move batches to device `size` steps ahead of consumption."""
    q = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        for batch in iterator:
            arrays = {
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            }
            if sharding is not None:
                arrays = jax.tree.map(lambda x: jax.device_put(x, sharding), arrays)
            else:
                arrays = jax.tree.map(jax.device_put, arrays)
            q.put(arrays)
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
