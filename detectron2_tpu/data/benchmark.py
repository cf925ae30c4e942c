"""Data-loading throughput benchmark helper (reference detectron2/data/benchmark.py)."""

import logging
import time
from itertools import islice
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["DataLoaderBenchmark"]


class DataLoaderBenchmark:
    """Benchmark the speed of a data loader (mapper / batching / prefetch)."""

    def __init__(self, dataset, *, mapper=None, sampler=None, total_batch_size: int = 16, num_workers: int = 0):
        from detectron2_tpu.data.build import build_detection_train_loader
        from detectron2_tpu.data.common import DatasetFromList, MapDataset

        if isinstance(dataset, list):
            dataset = DatasetFromList(dataset, copy=False)
        self.dataset = dataset
        self.mapper = mapper
        self.sampler = sampler
        self.total_batch_size = total_batch_size
        self.num_workers = num_workers

    def _benchmark(self, iterator, num_iter: int, warmup: int, msg: Optional[str] = None):
        for _ in range(warmup):
            next(iterator)
        timer = time.perf_counter()
        times = []
        for _ in range(num_iter):
            t0 = time.perf_counter()
            next(iterator)
            times.append(time.perf_counter() - t0)
        if msg:
            self._log_time(msg, np.asarray(times))
        return np.asarray(times)

    def _log_time(self, msg: str, times: np.ndarray):
        logger.info(
            "%s: avg=%.4fs, p50=%.4fs, p90=%.4fs, p99=%.4fs",
            msg,
            times.mean(),
            np.percentile(times, 50),
            np.percentile(times, 90),
            np.percentile(times, 99),
        )

    def benchmark_dataset(self, num_iter: int = 100, warmup: int = 5):
        """Raw dataset access speed (serialization/deserialization)."""

        def gen():
            i = 0
            while True:
                yield self.dataset[i % len(self.dataset)]
                i += 1

        self._benchmark(gen(), num_iter, warmup, "dataset itself")

    def benchmark_mapper(self, num_iter: int = 100, warmup: int = 5):
        """Single-process mapping speed."""
        from detectron2_tpu.data.common import MapDataset

        mapped = MapDataset(self.dataset, self.mapper)

        def gen():
            i = 0
            while True:
                yield mapped[i % len(mapped)]
                i += 1

        self._benchmark(gen(), num_iter, warmup, "single-process mapped data")

    def benchmark_loader(self, num_iter: int = 50, warmup: int = 5):
        """Full batched loader speed (mapping + padding + prefetch)."""
        from detectron2_tpu.data.build import build_detection_train_loader

        loader = build_detection_train_loader(
            self.dataset if isinstance(self.dataset, list) else list(range(0)),
            mapper=self.mapper,
            sampler=self.sampler,
            total_batch_size=self.total_batch_size,
        )
        self._benchmark(iter(loader), num_iter, warmup, f"batched loader (bs={self.total_batch_size})")
