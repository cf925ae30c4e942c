"""Learning-rate schedules (reference detectron2/solver/lr_scheduler.py).

In torch these are stateful LRScheduler objects; in optax a schedule is a pure
``step -> multiplier`` function, which also makes it trivially checkpointable
(the step count lives in the optimizer state). The classes below mirror the
reference semantics: a warmup prefix composed onto a base multiplier schedule.
"""

import math
from bisect import bisect_right
from typing import Callable, List, Optional

import jax.numpy as jnp

__all__ = [
    "WarmupParamScheduler",
    "MultiStepParamScheduler",
    "CosineParamScheduler",
    "LinearParamScheduler",
    "ConstantParamScheduler",
    "ExponentialParamScheduler",
    "WarmupMultiStepLR",
    "WarmupCosineLR",
    "LRMultiplier",
]


class ParamScheduler:
    """A function [0, 1] -> multiplier (fvcore ParamScheduler protocol)."""

    def __call__(self, where: float) -> float:
        raise NotImplementedError


class ConstantParamScheduler(ParamScheduler):
    def __init__(self, value: float):
        self._value = value

    def __call__(self, where: float) -> float:
        return self._value


class LinearParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, end_value: float):
        self._start = start_value
        self._end = end_value

    def __call__(self, where: float) -> float:
        return self._start + (self._end - self._start) * where


class CosineParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, end_value: float):
        self._start = start_value
        self._end = end_value

    def __call__(self, where: float) -> float:
        return self._end + 0.5 * (self._start - self._end) * (1 + math.cos(math.pi * where))


class ExponentialParamScheduler(ParamScheduler):
    def __init__(self, start_value: float, decay: float):
        self._start = start_value
        self._decay = decay

    def __call__(self, where: float) -> float:
        return self._start * (self._decay**where)


class MultiStepParamScheduler(ParamScheduler):
    """Piecewise-constant multiplier changing at given progress milestones."""

    def __init__(
        self,
        values: List[float],
        num_updates: Optional[int] = None,
        milestones: Optional[List[int]] = None,
    ):
        if milestones is None:
            assert num_updates is not None
            step = num_updates // len(values)
            milestones = [step * (i + 1) for i in range(len(values) - 1)]
            self._num_updates = num_updates
        else:
            if num_updates is None:
                num_updates = milestones[-1]
            self._num_updates = num_updates
            milestones = list(milestones)
            if len(milestones) == len(values):  # allow trailing milestone
                milestones = milestones[:-1]
        assert len(milestones) == len(values) - 1
        self._values = values
        self._milestones = milestones

    def __call__(self, where: float) -> float:
        step = int(where * self._num_updates)
        return self._values[bisect_right(self._milestones, step)]


class WarmupParamScheduler(ParamScheduler):
    """Add an initial warmup stage to another scheduler
    (reference lr_scheduler.py:22)."""

    def __init__(
        self,
        scheduler: ParamScheduler,
        warmup_factor: float,
        warmup_length: float,
        warmup_method: str = "linear",
        rescale_interval: bool = False,
    ):
        self._scheduler = scheduler
        self._warmup_factor = warmup_factor
        self._warmup_length = warmup_length
        self._warmup_method = warmup_method
        self._rescale = rescale_interval
        assert warmup_method in ("linear", "constant")

    def __call__(self, where: float) -> float:
        if where >= self._warmup_length:
            if self._rescale:
                where = (where - self._warmup_length) / (1 - self._warmup_length)
            return self._scheduler(where)
        # fvcore semantics: ramp from warmup_factor * scheduler(0) to the
        # scheduler's value at the end of warmup (matters when the wrapped
        # schedule is not flat at its start, e.g. cosine)
        start_value = self._warmup_factor * self._scheduler(0.0)
        if self._warmup_method == "constant":
            return start_value
        end_value = self._scheduler(0.0 if self._rescale else self._warmup_length)
        alpha = where / max(self._warmup_length, 1e-12)
        return start_value + (end_value - start_value) * alpha


class LRMultiplier:
    """Bridge a ParamScheduler into an optax-style ``step -> lr`` schedule
    (the analogue of reference lr_scheduler.py:61's torch bridge)."""

    def __init__(self, multiplier: ParamScheduler, max_iter: int, base_lr: float = 1.0):
        self._multiplier = multiplier
        self._max_iter = max_iter
        self._base_lr = base_lr

    def __call__(self, step) -> float:
        # works with both python ints and traced step counters: the scheduler
        # itself uses host python math, so under jit we precompute a table.
        if hasattr(step, "dtype"):
            table = jnp.asarray(
                [self._base_lr * self._multiplier(i / self._max_iter) for i in range(self._max_iter + 1)],
                jnp.float32,
            )
            return table[jnp.clip(step, 0, self._max_iter)]
        where = min(step / self._max_iter, 1.0)
        return self._base_lr * self._multiplier(where)


def WarmupMultiStepLR(
    base_lr: float,
    milestones: List[int],
    max_iter: int,
    gamma: float = 0.1,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> LRMultiplier:
    """The classic detection schedule (reference lr_scheduler.py:141)."""
    values = [gamma**k for k in range(len(milestones) + 1)]
    sched = MultiStepParamScheduler(values, num_updates=max_iter, milestones=milestones)
    sched = WarmupParamScheduler(sched, warmup_factor, min(warmup_iters / max_iter, 1.0), warmup_method)
    return LRMultiplier(sched, max_iter, base_lr)


def WarmupCosineLR(
    base_lr: float,
    max_iter: int,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
    end_lr_fraction: float = 0.0,
) -> LRMultiplier:
    """Cosine decay with warmup (reference lr_scheduler.py:180)."""
    sched = CosineParamScheduler(1.0, end_lr_fraction)
    sched = WarmupParamScheduler(sched, warmup_factor, min(warmup_iters / max_iter, 1.0), warmup_method)
    return LRMultiplier(sched, max_iter, base_lr)
