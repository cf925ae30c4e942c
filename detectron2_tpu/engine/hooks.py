"""Standard trainer hooks (reference detectron2/engine/hooks.py)."""

import datetime
import itertools
import logging
import math
import operator
import os
import tempfile
import time
from collections import Counter
from typing import Callable, Dict, List, Optional

import numpy as np

from detectron2_tpu.engine.train_loop import HookBase
from detectron2_tpu.evaluation.testing import flatten_results_dict
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.events import EventStorage, EventWriter

__all__ = [
    "CallbackHook",
    "IterationTimer",
    "PeriodicWriter",
    "PeriodicCheckpointer",
    "BestCheckpointer",
    "LRScheduler",
    "EvalHook",
    "JaxProfiler",
    "TorchProfiler",
]

logger = logging.getLogger(__name__)


class CallbackHook(HookBase):
    """Create a hook from callback functions (reference hooks.py:50)."""

    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._before_step = before_step
        self._after_step = after_step
        self._after_train = after_train

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)
        # functions may be closures that hold reference to the trainer
        del self._before_train, self._after_train
        del self._before_step, self._after_step

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Track iteration time, excluding hook overhead (reference hooks.py:85)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._step_timer = time.perf_counter()
        self._start_time = time.perf_counter()
        self._total_timer_total = 0.0
        self._total_paused = 0.0
        self._pause_start = None

    def before_train(self):
        self._start_time = time.perf_counter()
        self._total_timer_total = 0.0
        self._pause_start = time.perf_counter()  # paused until first before_step

    def after_train(self):
        total_time = time.perf_counter() - self._start_time
        total_time_minus_hooks = self._total_timer_total
        hook_time = total_time - total_time_minus_hooks

        num_iter = self.trainer.storage.iter + 1 - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0 and total_time_minus_hooks > 0:
            logger.info(
                "Overall training speed: {} iterations in {} ({:.4f} s / it)".format(
                    num_iter,
                    str(datetime.timedelta(seconds=int(total_time_minus_hooks))),
                    total_time_minus_hooks / num_iter,
                )
            )
        logger.info(
            "Total training time: {} ({} on hooks)".format(
                str(datetime.timedelta(seconds=int(total_time))),
                str(datetime.timedelta(seconds=int(hook_time))),
            )
        )

    def before_step(self):
        self._step_timer = time.perf_counter()
        if self._pause_start is not None:
            self._pause_start = None

    def after_step(self):
        iter_done = self.trainer.storage.iter - self.trainer.start_iter + 1
        sec = time.perf_counter() - self._step_timer
        self._total_timer_total += sec
        if iter_done > self._warmup_iter:
            self.trainer.storage.put_scalars(time=sec)
        else:
            self._start_time = time.perf_counter()
            self._total_timer_total = 0.0


class PeriodicWriter(HookBase):
    """Write events to EventWriters periodically (reference hooks.py:157)."""

    def __init__(self, writers: List[EventWriter], period: int = 20):
        self._writers = writers
        for w in writers:
            assert isinstance(w, EventWriter), w
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            for writer in self._writers:
                writer.write()

    def after_train(self):
        for writer in self._writers:
            writer.write()
            writer.close()


class PeriodicCheckpointer(HookBase):
    """Fire a checkpoint.PeriodicCheckpointer at each step (reference hooks.py:191)."""

    def __init__(self, checkpointer, period: int, max_iter=None, max_to_keep=None, file_prefix="model"):
        from detectron2_tpu.checkpoint import PeriodicCheckpointer as _PC

        self._pc = _PC(checkpointer, period, max_iter=max_iter, max_to_keep=max_to_keep, file_prefix=file_prefix)

    def before_train(self):
        if self._pc.max_iter is None:
            self._pc.max_iter = self.trainer.max_iter

    def after_step(self):
        # sync the checkpointer's view of the latest train state
        self._pc.checkpointer.params = getattr(self.trainer, "state", self._pc.checkpointer.params)
        self._pc.step(self.trainer.iter)


class BestCheckpointer(HookBase):
    """Checkpoint the best model according to a validation metric
    (reference hooks.py:210)."""

    def __init__(self, eval_period: int, checkpointer, val_metric: str, mode: str = "max", file_prefix: str = "model_best"):
        self._period = eval_period
        self._val_metric = val_metric
        assert mode in ["max", "min"]
        self._compare = operator.gt if mode == "max" else operator.lt
        self._checkpointer = checkpointer
        self._file_prefix = file_prefix
        self.best_metric = None
        self.best_iter = None

    def _update_best(self, val, iteration):
        if math.isnan(val) or math.isinf(val):
            return False
        self.best_metric = val
        self.best_iter = iteration
        return True

    def _best_checking(self):
        metric_tuple = self.trainer.storage.latest().get(self._val_metric)
        if metric_tuple is None:
            logger.warning(
                f"Given val metric {self._val_metric} does not seem to be computed/stored. "
                "Will not be checkpointing based on it."
            )
            return
        latest_metric, metric_iter = metric_tuple

        if self.best_metric is None:
            if self._update_best(latest_metric, metric_iter):
                self._checkpointer.save(f"{self._file_prefix}")
                logger.info(f"Saved first model at {self.best_metric:0.5f} @ {self.best_iter} steps")
        elif self._compare(latest_metric, self.best_metric):
            self._checkpointer.save(f"{self._file_prefix}")
            logger.info(
                f"Saved best model as latest eval score for {self._val_metric} is "
                f"{latest_metric:0.5f}, better than last best score "
                f"{self.best_metric:0.5f} @ iteration {self.best_iter}."
            )
            self._update_best(latest_metric, metric_iter)

    def after_step(self):
        if (
            self._period > 0
            and (self.trainer.iter + 1) % self._period == 0
            and self.trainer.iter != self.trainer.max_iter - 1
        ):
            self._best_checking()

    def after_train(self):
        if self.trainer.iter + 1 >= self.trainer.max_iter:
            self._best_checking()


class LRScheduler(HookBase):
    """Log the learning rate each step. In this framework the LR schedule is
    *inside* the compiled optimizer (optax scale_by_schedule), so unlike the
    reference (hooks.py:307) there is nothing to step — the hook only reports."""

    def __init__(self, schedule: Optional[Callable] = None):
        self._schedule = schedule

    def after_step(self):
        if self._schedule is not None:
            lr = float(self._schedule(self.trainer.iter))
            self.trainer.storage.put_scalar("lr", lr, smoothing_hint=False)


class JaxProfiler(HookBase):
    """jax.profiler trace over an iteration window (the TPU analogue of the
    reference's TorchProfiler, hooks.py:377): dumps xplane traces viewable in
    xprof/tensorboard."""

    def __init__(self, enable_predicate: Callable, output_dir: str):
        self._enable_predicate = enable_predicate
        self._output_dir = output_dir
        self._active = False

    def before_step(self):
        if self._enable_predicate(self.trainer) and not self._active:
            import jax

            os.makedirs(self._output_dir, exist_ok=True)
            jax.profiler.start_trace(self._output_dir)
            self._active = True

    def after_step(self):
        if self._active and not self._enable_predicate(self.trainer):
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info("Saved profiler trace to %s", self._output_dir)

    def after_train(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


# API-parity alias: the reference's name
TorchProfiler = JaxProfiler


class EvalHook(HookBase):
    """Run an evaluation function periodically and at the end of training
    (reference hooks.py:502)."""

    def __init__(self, eval_period: int, eval_function: Callable, eval_after_train: bool = True):
        self._period = eval_period
        self._func = eval_function
        self._eval_after_train = eval_after_train

    def _do_eval(self):
        results = self._func()

        if results:
            assert isinstance(results, dict), f"Eval function must return a dict. Got {results} instead."
            flattened_results = flatten_results_dict(results)
            for k, v in flattened_results.items():
                try:
                    v = float(v)
                except Exception as e:
                    raise ValueError(
                        "[EvalHook] eval_function should return a nested dict of float. "
                        f"Got '{k}: {v}' instead."
                    ) from e
            self.trainer.storage.put_scalars(**flattened_results, smoothing_hint=False)

        comm.synchronize()

    def after_step(self):
        next_iter = self.trainer.iter + 1
        if self._period > 0 and next_iter % self._period == 0:
            if next_iter != self.trainer.max_iter:
                self._do_eval()

    def after_train(self):
        if self._eval_after_train and self.trainer.iter + 1 >= self.trainer.max_iter:
            self._do_eval()
        del self._func


class PreciseBN(HookBase):
    """Recompute exact BatchNorm statistics before eval
    (reference hooks.py:567; fvcore update_bn_stats analogue).

    Only meaningful for models using trainable BatchNorm ("BN"/"SyncBN"):
    runs N forward passes in train mode, averaging batch statistics into the
    batch_stats collection. FrozenBN models (the detection default) skip it.
    """

    def __init__(self, period: int, model, data_loader, num_iter: int):
        self._period = period
        self._model = model
        self._data_loader = data_loader
        self._num_iter = num_iter
        self._disabled = False
        self._data_iter = None

    def update_stats(self):
        if self._disabled:
            return
        import jax
        import jax.numpy as jnp

        state = self.trainer.state
        variables = state.params
        if not isinstance(variables, dict) or "batch_stats" not in variables:
            logger.info("PreciseBN: model has no batch_stats collection; disabled.")
            self._disabled = True
            return

        if self._data_iter is None:
            self._data_iter = iter(self._data_loader)

        @jax.jit
        def stats_step(vars_, batch, rng):
            _, new_vars = self._model.apply(
                batch if False else vars_, batch, train=True,
                rngs={"sampling": rng}, mutable=["batch_stats"],
            )
            return new_vars["batch_stats"]

        running = None
        rng = jax.random.PRNGKey(0)
        for i in range(self._num_iter):
            batch = next(self._data_iter)
            batch.pop("metadata", None)
            stats = stats_step(variables, batch, jax.random.fold_in(rng, i))
            if running is None:
                running = stats
            else:
                running = jax.tree_util.tree_map(lambda a, b: a + b, running, stats)
        running = jax.tree_util.tree_map(lambda a: a / self._num_iter, running)
        new_vars = dict(variables)
        new_vars["batch_stats"] = running
        self.trainer._trainer.state = state.replace(params=new_vars)
        logger.info("PreciseBN: updated batch statistics over %d iters.", self._num_iter)

    def after_step(self):
        next_iter = self.trainer.iter + 1
        is_final = next_iter == self.trainer.max_iter
        if is_final or (self._period > 0 and next_iter % self._period == 0):
            self.update_stats()


class MemoryStats(HookBase):
    """Log device memory statistics (TPU analogue of TorchMemoryStats,
    reference hooks.py:639)."""

    def __init__(self, period: int = 20):
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period != 0:
            return
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                self.trainer.storage.put_scalars(
                    device_bytes_in_use=stats.get("bytes_in_use", 0) / 2**20,
                    device_peak_bytes=stats.get("peak_bytes_in_use", 0) / 2**20,
                    smoothing_hint=False,
                )
        except Exception:
            pass


TorchMemoryStats = MemoryStats
