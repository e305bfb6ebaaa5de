"""Batching data loader with background prefetch and per-host sharding.

Replaces torch ``DataLoader`` (the reference's only multiprocess component,
SURVEY §2): samples are fetched by a thread pool (h5py/NumPy release the
GIL), collated host-side, and optionally sharded so each JAX process feeds
its slice of a global batch (``jax.make_array_from_process_local_data``
composition happens in the training layer).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from texttoaudiogrounding_tpu.utils.registry import register


@register("DataLoader")
class DataLoader:
    def __init__(self, dataset, batch_size: int,
                 collate_fn: Optional[Callable] = None,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, num_workers: int = 0,
                 prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or (lambda items: items)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the shuffle (and dataset sampling) RNG per epoch."""
        self.epoch = epoch
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(epoch)

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        order = order[self.shard_index::self.num_shards]
        batches = []
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def __len__(self) -> int:
        return len(self._batch_indices())

    def _make_batch(self, idxs: np.ndarray):
        return self.collate_fn([self.dataset[int(i)] for i in idxs])

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for idxs in batches:
                yield self._make_batch(idxs)
            return

        from concurrent.futures import ThreadPoolExecutor
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            window = self.num_workers + self.prefetch
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self._make_batch, idxs)
                           for idxs in batches[:window]]
                next_idx = window
                for i in range(len(batches)):
                    q.put(futures[i].result())  # blocks when queue is full
                    if next_idx < len(batches):
                        futures.append(
                            pool.submit(self._make_batch,
                                        batches[next_idx]))
                        next_idx += 1
            q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
