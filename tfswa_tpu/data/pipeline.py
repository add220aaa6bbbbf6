"""Host -> device data pipeline: threaded batch loading + device prefetch.

Replaces the reference's torch DataLoader worker processes
(reference: scripts/train.py:189-209) with an IO-thread pool (soundfile reads
release the GIL) and an explicit prefetch-to-device queue so input transfer
overlaps TPU compute — the pattern SURVEY.md section 7 calls for.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from .musdb import collate


class DataLoader:
    """Minimal map-style loader: shuffling, batching, threaded workers.

    Yields host numpy batches (mixture (B, 2, S), {stem: (B, 2, S)}).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            idx = order[i : i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator:
        self._epoch += 1
        batches = self._batch_indices()
        if self.num_workers == 0:
            for idx in batches:
                yield collate([self.dataset[int(i)] for i in idx])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            lambda i: self.dataset[int(i)], idx
                        ))
                        out_q.put(collate(samples))
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Move batches to device `size` steps ahead of consumption.

    With a NamedSharding, batches land pre-sharded over the mesh's data axis;
    otherwise they go to the default device.
    """

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    buf = []
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
