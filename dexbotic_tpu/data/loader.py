"""Prefetching data loader: thread OR process item fetch + device buffering.

Replaces the reference's torch DataLoader(num_workers=N) (SURVEY.md §3.1
"DataLoader workers (8 procs)", reference exp/base_exp.py:453-503) with two
selectable worker pools and an N-deep device prefetch queue so host decode
overlaps TPU compute (SURVEY.md §7 'Host/device split'):

* worker_mode='thread' — a ThreadPoolExecutor; fine when the per-item work
  is dominated by cv2/PIL/numpy C code that releases the GIL.
* worker_mode='process' — forked worker processes, each pulling
  (batch_id, indices) tasks and returning COLLATED numpy batches, with an
  ordered reassembly buffer in the parent.  This is the torch-DataLoader
  analogue for decode paths with real Python cost (jsonl parse, transform
  pipeline dispatch) that a single GIL serializes.  Fork-start only (the
  dataset is inherited by memory image, never pickled).

Multihost: pass process_id/process_count to slice every GLOBAL batch into
this host's contiguous rows (the DistributedSampler analogue used by
exp/base_exp.data_iterator — same seed => same permutation everywhere).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import jax
import numpy as np


def _process_worker(dataset, collate_fn, task_q, result_q):
    while True:
        task = task_q.get()
        if task is None:
            return
        batch_id, idxs = task
        try:
            batch = collate_fn([dataset[i] for i in idxs])
            result_q.put((batch_id, batch, None))
        except Exception as e:  # surface worker errors in the parent
            result_q.put((batch_id, None, repr(e)))


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
        worker_mode: str = "thread",  # 'thread' | 'process'
        process_id: int = 0,
        process_count: int = 1,
        prefetch_batches: int = 2,
    ):
        assert worker_mode in ("thread", "process"), worker_mode
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.epochs = epochs
        self.worker_mode = worker_mode
        self.process_id = process_id
        self.process_count = process_count
        self.prefetch_batches = max(1, prefetch_batches)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_stream(self) -> Iterator[list[int]]:
        """Yields THIS host's rows of each global batch."""
        rng = random.Random(self.seed)
        local = self.batch_size // self.process_count
        lo, hi = self.process_id * local, (self.process_id + 1) * local
        epoch = 0
        while self.epochs is None or epoch < self.epochs:
            order = list(range(len(self.dataset)))
            if self.shuffle:
                rng.shuffle(order)
            end = len(order) if not self.drop_last else len(order) - len(order) % self.batch_size
            for s in range(0, end, self.batch_size):
                yield order[s + lo : min(s + hi, len(order))]
            epoch += 1

    def __iter__(self):
        if self.worker_mode == "process":
            yield from self._iter_process()
        else:
            yield from self._iter_thread()

    def _iter_thread(self):
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()
            idx_stream = self._index_stream()

            def submit_next():
                try:
                    idxs = next(idx_stream)
                except StopIteration:
                    return None
                futures = [pool.submit(self.dataset.__getitem__, i) for i in idxs]
                return futures

            for _ in range(self.prefetch_batches):
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

    def _iter_process(self):
        ctx = mp.get_context("fork")
        task_q = ctx.SimpleQueue()
        result_q = ctx.SimpleQueue()
        workers = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, self.collate_fn, task_q, result_q),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for w in workers:
            w.start()
        idx_stream = self._index_stream()
        next_submit = 0  # batch_id to dispatch next
        next_yield = 0  # batch_id owed to the consumer next (ordered)
        reorder: dict = {}
        exhausted = False
        # keep >=1 task queued per worker plus the prefetch margin
        in_flight_target = self.num_workers + self.prefetch_batches
        try:
            while True:
                while not exhausted and next_submit - next_yield < in_flight_target:
                    try:
                        idxs = next(idx_stream)
                    except StopIteration:
                        exhausted = True
                        break
                    task_q.put((next_submit, idxs))
                    next_submit += 1
                if next_yield >= next_submit:
                    return  # drained
                while next_yield not in reorder:
                    batch_id, batch, err = result_q.get()
                    if err is not None:
                        raise RuntimeError(f"loader worker failed: {err}")
                    reorder[batch_id] = batch
                yield reorder.pop(next_yield)
                next_yield += 1
        finally:
            for _ in workers:
                task_q.put(None)
            for w in workers:
                w.join(timeout=5)
                if w.is_alive():
                    w.terminate()


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
