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
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``batch_size`` is the GLOBAL batch size.  Under multi-host
        training pass ``num_shards=jax.process_count()`` and
        ``shard_index=jax.process_index()``: every process builds the same
        global batch order (same seed -> same shuffle; per-(seed, epoch,
        idx) segment sampling -> same samples) and loads only its
        contiguous batch_size/num_shards slice — matching the
        process-major 'data' axis order of parallel.mesh.create_mesh."""
        if batch_size % max(num_shards, 1):
            raise ValueError(
                f"global batch_size {batch_size} must divide over "
                f"{num_shards} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.num_shards = max(1, num_shards)
        self.shard_index = shard_index
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
        local = self.batch_size // self.num_shards
        for i in range(0, n, self.batch_size):
            idx = order[i : i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            if self.num_shards > 1:
                # this process's contiguous slice of the global batch
                idx = idx[self.shard_index * local:
                          (self.shard_index + 1) * local]
                if len(idx) == 0:
                    continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator:
        self._epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            # advance the dataset's per-(seed, epoch, idx) sampling stream so
            # random segments differ across epochs but not across worker counts
            self.dataset.set_epoch(self._epoch)
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
    otherwise they go to the default device.  Under multi-host training
    (jax.process_count() > 1) each process feeds only its local slice (see
    DataLoader num_shards) and the global array is assembled from the
    per-process shards.
    """

    def put(batch):
        if sharding is not None:
            if jax.process_count() > 1:
                from ..parallel.distributed import make_global_batch

                return make_global_batch(batch, sharding)
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
