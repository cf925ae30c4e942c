"""Samplers producing index streams (reference detectron2/data/samplers/distributed_sampler.py).

In the JAX single-controller model one host process may feed several local
devices; ``rank``/``world_size`` default to jax process index/count so
multi-host input pipelines shard exactly like the reference's per-GPU
sharding (indices[rank::world_size], reference :58-70).
"""

import itertools
import logging
import math
from collections import defaultdict
from typing import Iterator, List, Optional

import numpy as np

from detectron2_tpu.utils import comm

logger = logging.getLogger(__name__)

__all__ = [
    "TrainingSampler",
    "RandomSubsetTrainingSampler",
    "InferenceSampler",
    "RepeatFactorTrainingSampler",
]


class Sampler:
    def __iter__(self) -> Iterator[int]:
        raise NotImplementedError


class TrainingSampler(Sampler):
    """An infinite stream of (shuffled) indices, sharded by process."""

    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None):
        if not isinstance(size, int):
            raise TypeError(f"TrainingSampler(size=) expects an int. Got type {type(size)}.")
        if size <= 0:
            raise ValueError(f"TrainingSampler(size=) expects a positive int. Got {size}.")
        self._size = size
        self._shuffle = shuffle
        if seed is None:
            seed = comm.shared_random_seed()
        self._seed = int(seed)
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

    def __iter__(self) -> Iterator[int]:
        start = self._rank
        yield from itertools.islice(self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)


class RandomSubsetTrainingSampler(TrainingSampler):
    """TrainingSampler over a random subset of the dataset
    (reference :73-128)."""

    def __init__(self, size: int, subset_ratio: float, shuffle: bool = True, seed_shuffle=None, seed_subset=None):
        super().__init__(size=size, shuffle=shuffle, seed=seed_shuffle)
        assert 0.0 < subset_ratio <= 1.0
        self._size_subset = int(size * subset_ratio)
        assert self._size_subset > 0
        if seed_subset is None:
            seed_subset = comm.shared_random_seed()
        rng = np.random.RandomState(int(seed_subset))
        self._indexes_subset = np.sort(rng.permutation(size)[: self._size_subset])
        logger.info("Using RandomSubsetTrainingSampler......")

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from self._indexes_subset[rng.permutation(self._size_subset)].tolist()
            else:
                yield from self._indexes_subset.tolist()


class RepeatFactorTrainingSampler(Sampler):
    """Repeat images in proportion to their rarest category's repeat factor
    (LVIS class balancing; reference :130-252)."""

    def __init__(self, repeat_factors: np.ndarray, *, shuffle: bool = True, seed: Optional[int] = None):
        self._shuffle = shuffle
        if seed is None:
            seed = comm.shared_random_seed()
        self._seed = int(seed)
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()
        # split into whole number and fractional parts
        self._int_part = np.trunc(repeat_factors)
        self._frac_part = repeat_factors - self._int_part

    @staticmethod
    def repeat_factors_from_category_frequency(dataset_dicts, repeat_thresh: float, sqrt: bool = True) -> np.ndarray:
        """r(c) = max(1, f(t/f(c))) with f = sqrt or identity."""
        category_freq: dict = defaultdict(int)
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            for cat_id in cat_ids:
                category_freq[cat_id] += 1
        num_images = len(dataset_dicts)
        for k, v in category_freq.items():
            category_freq[k] = v / num_images

        def f(x):
            return math.sqrt(x) if sqrt else x

        category_rep = {
            cat_id: max(1.0, f(repeat_thresh / cat_freq))
            for cat_id, cat_freq in category_freq.items()
        }

        rep_factors = []
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            rep_factor = max({category_rep[cat_id] for cat_id in cat_ids}, default=1.0)
            rep_factors.append(rep_factor)
        return np.asarray(rep_factors, dtype=np.float32)

    def _get_epoch_indices(self, rng: np.random.RandomState) -> np.ndarray:
        rands = rng.rand(len(self._frac_part))
        rep_factors = self._int_part + (rands < self._frac_part).astype(np.float64)
        indices = []
        for dataset_index, rep_factor in enumerate(rep_factors):
            indices.extend([dataset_index] * int(rep_factor))
        return np.asarray(indices, dtype=np.int64)

    def __iter__(self) -> Iterator[int]:
        start = self._rank
        yield from itertools.islice(self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            indices = self._get_epoch_indices(rng)
            if self._shuffle:
                yield from indices[rng.permutation(len(indices))].tolist()
            else:
                yield from indices.tolist()


class InferenceSampler(Sampler):
    """Exact partition of indices across processes for inference
    (reference :254-290)."""

    def __init__(self, size: int):
        self._size = size
        assert size > 0
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()
        self._local_indices = self._get_local_indices(size, self._world_size, self._rank)

    @staticmethod
    def _get_local_indices(total_size: int, world_size: int, rank: int) -> List[int]:
        shard_size = total_size // world_size
        left = total_size % world_size
        shard_sizes = [shard_size + int(r < left) for r in range(world_size)]
        begin = sum(shard_sizes[:rank])
        end = min(sum(shard_sizes[: rank + 1]), total_size)
        return list(range(begin, end))

    def __iter__(self) -> Iterator[int]:
        yield from self._local_indices

    def __len__(self) -> int:
        return len(self._local_indices)
