"""Prefetching batch feeder: host IO / augmentation runs in a background
thread while the TPU executes the previous step; batches land on device
via `jax.device_put` double buffering.

Replaces the reference's torch DataLoader+TwoStreamBatchSampler pair
(train_DyCON_Pancreas.py:162-167) with an explicit, deterministic,
thread-based producer: each (epoch, batch) gets an independent
`np.random.Generator` stream derived from the base seed, so results are
reproducible regardless of prefetch depth or timing.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from .samplers import TwoStreamBatchSampler


class BatchLoader:
    """Iterable over device-ready {'image','label'} batches.

    dataset: object with .get(idx, rng) -> {'image': (D,H,W,1) f32,
             'label': (D,H,W) i32}
    sampler: iterable of index lists (re-iterated each epoch)
    """

    def __init__(
        self,
        dataset,
        sampler: TwoStreamBatchSampler,
        seed: int = 0,
        prefetch: int = 2,
        device_put=None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.sampler)

    def _assemble(self, indices: list[int], rng: np.random.Generator) -> dict:
        samples = [self.dataset.get(i, rng) for i in indices]
        return {
            "image": np.stack([s["image"] for s in samples]),
            "label": np.stack([s["label"] for s in samples]),
        }

    def epoch(self) -> Iterator[dict]:
        """One epoch of prefetched batches (one pass over labeled indices)."""
        epoch_id = self._epoch
        self._epoch += 1
        batches = list(iter(self.sampler))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks `stop`: a consumer that breaks out
            # mid-epoch (max_iterations reached) would otherwise leave this
            # thread blocked forever in q.put holding device batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            for b, indices in enumerate(batches):
                if stop.is_set():
                    return
                rng = np.random.default_rng((self.seed, epoch_id, b))
                batch = self._assemble(indices, rng)
                if self.device_put is not None:
                    batch = self.device_put(batch)
                if not put(batch):
                    return
            put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[dict]:
        return self.epoch()
