"""Semi-supervised batch index generators.

`TwoStreamBatchSampler` builds each batch as
    [labeled_0..labeled_{k-1} | unlabeled_0..unlabeled_{m-1}]
so that every loss can slice `batch[:labeled_bs]` for the supervised
terms — the ordering contract the whole trainer relies on (the
reference's sampler: dataloaders/brats19.py:289-317). An epoch is one
pass over the primary (labeled) indices; the secondary (unlabeled)
stream reshuffles forever.

Unlike the reference (implicit global numpy RNG) these are explicit
`numpy.random.Generator` iterators: deterministic, seedable, and safe
to drive from a prefetch thread.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


def _eternal_permutations(indices: Sequence[int], rng: np.random.Generator) -> Iterator[int]:
    idx = np.asarray(indices)
    while True:
        yield from rng.permutation(idx)


class TwoStreamBatchSampler:
    def __init__(
        self,
        primary_indices: Sequence[int],
        secondary_indices: Sequence[int],
        batch_size: int,
        secondary_batch_size: int,
        seed: int = 0,
    ):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size
        self.rng = np.random.default_rng(seed)
        assert len(self.primary_indices) >= self.primary_batch_size > 0
        assert len(self.secondary_indices) >= self.secondary_batch_size > 0

    def __iter__(self) -> Iterator[list[int]]:
        primary = self.rng.permutation(np.asarray(self.primary_indices))
        secondary = _eternal_permutations(self.secondary_indices, self.rng)
        n_batches = len(self)
        for b in range(n_batches):
            p = primary[b * self.primary_batch_size : (b + 1) * self.primary_batch_size]
            s = [next(secondary) for _ in range(self.secondary_batch_size)]
            yield [int(i) for i in p] + [int(i) for i in s]

    def __len__(self) -> int:
        return len(self.primary_indices) // self.primary_batch_size


class ThreeStreamBatchSampler:
    """Three-way split batches [primary | secondary | tertiary]; present for
    API completeness (the reference defines but never uses it,
    dataloaders/isles22.py:280-308)."""

    def __init__(
        self,
        primary_indices: Sequence[int],
        secondary_indices: Sequence[int],
        tertiary_indices: Sequence[int],
        batch_size: int,
        secondary_batch_size: int,
        tertiary_batch_size: int,
        seed: int = 0,
    ):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.tertiary_indices = list(tertiary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.tertiary_batch_size = tertiary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size - tertiary_batch_size
        self.rng = np.random.default_rng(seed)
        assert len(self.primary_indices) >= self.primary_batch_size > 0

    def __iter__(self) -> Iterator[list[int]]:
        primary = self.rng.permutation(np.asarray(self.primary_indices))
        secondary = _eternal_permutations(self.secondary_indices, self.rng)
        tertiary = _eternal_permutations(self.tertiary_indices, self.rng)
        for b in range(len(self)):
            p = primary[b * self.primary_batch_size : (b + 1) * self.primary_batch_size]
            s = [next(secondary) for _ in range(self.secondary_batch_size)]
            t = [next(tertiary) for _ in range(self.tertiary_batch_size)]
            yield [int(i) for i in p] + s + t

    def __len__(self) -> int:
        return len(self.primary_indices) // self.primary_batch_size
