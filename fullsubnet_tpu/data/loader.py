"""Host-side data loader: sharded, shuffled, multiprocess-prefetched.

Replaces the reference's ``torch.utils.data.DataLoader`` +
``DistributedSampler`` (``train.py:37-43``) with a framework-native loader:

* **Per-host sharding** — shard ``shard_index``/``num_shards`` takes every
  Nth index of the epoch permutation (DistributedSampler semantics,
  including the pad-to-even-length behavior), so on a TPU pod each host
  only synthesizes the examples its local devices will consume.
* **Process-pool prefetch** — __getitem__ runs in worker processes; a
  background thread keeps ``prefetch_batches`` ready so synthesis
  (fftconvolve, resampling) overlaps device step time.
* Deterministic: order depends only on (seed, epoch).
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def default_collate(items):
    """Stack tuples of arrays into batched arrays."""
    first = items[0]
    if isinstance(first, (tuple, list)):
        return tuple(default_collate([it[i] for it in items]) for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, str):
        return items  # keep Python strings, not a numpy '<U' array
    if np.isscalar(first):
        return np.asarray(items)
    return items


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch_batches: int = 2,
        collate_fn=default_collate,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch_batches = max(1, prefetch_batches)
        self.collate_fn = collate_fn
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            )
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_shards > 1:
            # pad so every shard sees the same count (DistributedSampler)
            total = -(-n // self.num_shards) * self.num_shards
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.shard_index :: self.num_shards]
        return idx

    def __len__(self) -> int:
        # arithmetic, not len(self._epoch_indices()): no O(n) permutation
        # just to count batches
        n = len(self.dataset)
        if self.num_shards > 1:
            n = -(-n // self.num_shards)  # padded shard size
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self, idx: np.ndarray):
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self):
        idx = self._epoch_indices()
        if self.num_workers <= 0:
            for batch_idx in self._batches(idx):
                yield self.collate_fn([self.dataset[int(i)] for i in batch_idx])
            return
        yield from self._iter_parallel(idx)

    def _iter_parallel(self, idx: np.ndarray):
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        # set when the consumer abandons the iteration (exception in the
        # train loop, break, GC of the generator): the producer must then
        # stop promptly instead of blocking forever on a full queue, which
        # would leak the worker pool for the life of the process
        cancelled = threading.Event()

        def _put(item) -> bool:
            while not cancelled.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                # ship the dataset once per worker via the initializer, not
                # once per task
                # forkserver: fork() from this multithreaded (JAX) process is
                # unsafe; forkserver keeps worker startup cheap and safe
                with ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=multiprocessing.get_context("forkserver"),
                    initializer=_init_worker,
                    initargs=(self.dataset,),
                ) as pool:
                    pending = []
                    alive = True
                    for batch_idx in self._batches(idx):
                        if cancelled.is_set():
                            alive = False
                            break
                        futures = [pool.submit(_fetch, int(i)) for i in batch_idx]
                        pending.append(futures)
                        # bounded pipeline: resolve oldest batch once enough in flight
                        while alive and len(pending) > self.prefetch_batches:
                            done = pending.pop(0)
                            alive = _put(
                                self.collate_fn([f.result() for f in done])
                            )
                    for done in pending:
                        if not alive:
                            break
                        alive = _put(self.collate_fn([f.result() for f in done]))
            except Exception as e:  # propagate to consumer
                _put(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
            t.join()
        finally:
            cancelled.set()
            # unblock a producer stuck in put() and let the pool wind down
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=60)


_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _fetch(i):
    return _WORKER_DATASET[i]
