"""Host-side input pipeline: threaded decode + batched device prefetch.

TPU-native replacement for ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (train.py:113-130): a thread pool decodes/augments tiles
(the work is numpy/cv2/zlib which release the GIL), batches are assembled on
host, and up to ``prefetch`` batches are placed on device asynchronously
(``jax.device_put`` with an optional data-axis sharding) so the jitted step
never waits on I/O. Multi-host: give each process a disjoint shard of the
index list via ``shard_index``/``num_shards``.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        if key == "path":
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples])
    return out


class DataLoader:
    """Iterable over batched sample dicts with background decoding."""

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 seed: int = 1337, shard_index: int = 0, num_shards: int = 1,
                 prefetch: int = 2, device_put: bool = False,
                 sharding=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.shard_index, self.num_shards = shard_index, num_shards
        if prefetch < 1:
            # queue.Queue(maxsize=0) would mean UNBOUNDED prefetch — the
            # producer would decode (and with device_put, upload) the whole
            # epoch ahead of the consumer
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        self.prefetch = prefetch
        self.device_put = device_put
        self.sharding = sharding

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        shard = idx[self.shard_index:: self.num_shards]
        if self.num_shards > 1:
            # equal shard lengths: in jax.distributed training every step is
            # a collective, so a process with one extra batch would leave its
            # peers blocked in psum (torch's DistributedSampler equalises for
            # the same reason — we truncate to the minimum shard length)
            shard = shard[: len(self.dataset) // self.num_shards]
        return shard

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        if hasattr(self.dataset, "set_epoch"):
            # advance the dataset's per-(seed, epoch, index) augmentation
            # stream: thread-safe and reproducible under any num_workers
            self.dataset.set_epoch(self.epoch)
        self.epoch += 1
        batches = [indices[i: i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            """Blocking put that re-checks ``stop`` so an early-exiting
            consumer (max_steps, exceptions) never strands the producer."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, batch_idx))
                        batch = _collate(samples)
                        if self.device_put:
                            paths = batch.pop("path", None)
                            batch = {
                                k: jax.device_put(v, self.sharding)
                                for k, v in batch.items()
                            }
                            if paths is not None:
                                batch["path"] = paths
                        if not _put(batch):
                            return
            except BaseException as exc:  # surface worker errors, never hang
                _put(exc)
            else:
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
