"""Training loop: HookBase / TrainerBase / SimpleTrainer.

Parity with reference detectron2/engine/train_loop.py:19-527. TPU re-design:

- the unit of work is one compiled SPMD step (parallel.make_train_step):
  forward + losses + grads + psum + optimizer update in one XLA program;
  there is no separate backward()/optimizer.step().
- metrics are written with a one-step delay so the host never blocks the
  device pipeline on loss readback (the async analogue of the reference's
  metric thread pool, train_loop.py:283).
- AMPTrainer has no separate existence: bf16 compute is a model dtype
  (cfg.TPU.COMPUTE_DTYPE), and loss scaling is unnecessary with bf16's
  exponent range. SimpleTrainer covers both.
"""

import logging
import time
import weakref
from typing import Any, Callable, Dict, List, Mapping, Optional

import numpy as np

import jax

from detectron2_tpu.utils import comm
from detectron2_tpu.utils.events import EventStorage, get_event_storage

__all__ = ["HookBase", "TrainerBase", "SimpleTrainer", "AMPTrainer"]


class HookBase:
    """Base class for hooks that can be registered with :class:`TrainerBase`.

    Each hook can implement 4 methods (before_train, after_train, before_step,
    after_step), called in the reference's loop order (train_loop.py:19-91).
    """

    trainer: "TrainerBase" = None

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_backward(self):
        pass

    def after_step(self):
        pass

    def state_dict(self) -> Dict:
        """Hooks are stateless by default; subclasses can save state."""
        return {}

    def load_state_dict(self, state_dict: Dict):
        pass


class TrainerBase:
    """Base loop: before_train -> {before_step, run_step, after_step} ->
    after_train, with an EventStorage context (reference train_loop.py:94-220)."""

    def __init__(self) -> None:
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: EventStorage = None

    def register_hooks(self, hooks) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            # use weakref to avoid circular reference keeping trainers alive
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int):
        logger = logging.getLogger(__name__)
        logger.info("Starting training from iteration {}".format(start_iter))

        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter

        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.before_step()
                    self.run_step()
                    self.after_step()
                # self.iter == max_iter can be used by `after_train` to
                # tell whether the training successfully finished or failed
                self.iter += 1
            except Exception:
                logger.exception("Exception during training:")
                raise
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        # self.storage is None when this trainer is driven by an outer
        # trainer (DefaultTrainer calls the inner SimpleTrainer's run_step /
        # after_train directly, and only the outer loop opens EventStorage)
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        self.storage.iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_backward(self):
        for h in self._hooks:
            h.after_backward()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError

    def state_dict(self) -> Dict:
        ret = {"iteration": self.iter}
        hooks_state = {}
        for h in self._hooks:
            sd = h.state_dict()
            if sd:
                name = type(h).__qualname__
                hooks_state[name] = sd
        if hooks_state:
            ret["hooks"] = hooks_state
        return ret

    def load_state_dict(self, state_dict: Dict):
        logger = logging.getLogger(__name__)
        self.iter = state_dict["iteration"]
        for key, value in state_dict.get("hooks", {}).items():
            for h in self._hooks:
                if type(h).__qualname__ == key:
                    h.load_state_dict(value)
                    break
            else:
                logger.warning(f"Cannot find the hook '{key}', its state_dict is ignored.")


class SimpleTrainer(TrainerBase):
    """Single-cost-function training with a compiled SPMD step
    (reference train_loop.py:223-431)."""

    def __init__(
        self,
        train_step: Callable,
        data_loader,
        state,
        rng: Optional[jax.Array] = None,
        async_write_metrics: bool = True,
    ):
        """
        Args:
            train_step: (state, batch, rng) -> (state, loss_dict); typically
                parallel.make_train_step(model, mesh).
            data_loader: iterable of padded batch dicts.
            state: initial parallel.TrainState.
            rng: base PRNG key for training-time sampling.
        """
        super().__init__()
        self.train_step = train_step
        self.state = state
        self.data_loader = data_loader
        self._data_loader_iter_obj = None
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.async_write_metrics = async_write_metrics
        self._pending_metrics = None  # (iter, data_time, loss_dict of device arrays)

    @property
    def _data_loader_iter(self):
        if self._data_loader_iter_obj is None:
            self._data_loader_iter_obj = iter(self.data_loader)
        return self._data_loader_iter_obj

    def reset_data_loader(self, data_loader_builder):
        """Delete and replace the current data loader."""
        del self.data_loader
        data_loader = data_loader_builder()
        self.data_loader = data_loader
        self._data_loader_iter_obj = None

    def run_step(self):
        start = time.perf_counter()
        batch = next(self._data_loader_iter)
        batch.pop("metadata", None)
        data_time = time.perf_counter() - start

        step_rng = jax.random.fold_in(self.rng, self.iter)
        self.state, loss_dict = self.train_step(self.state, batch, step_rng)

        # Write the PREVIOUS step's metrics now that this step is dispatched:
        # materializing them no longer stalls the device pipeline.
        if self.async_write_metrics and self._pending_metrics is not None:
            it, dt, pending = self._pending_metrics
            self._write_metrics(pending, dt, cur_iter=it)
        self._pending_metrics = (self.iter, data_time, loss_dict)
        if not self.async_write_metrics:
            self._write_metrics(loss_dict, data_time, cur_iter=self.iter)

        self.after_backward()

    def _write_metrics(self, loss_dict, data_time: float, cur_iter: Optional[int] = None, prefix: str = ""):
        """Reduce metrics over processes and log (reference train_loop.py:372-418)."""
        metrics = {k: float(np.asarray(v)) for k, v in loss_dict.items()}
        metrics["data_time"] = data_time
        cur_iter = self.iter if cur_iter is None else cur_iter

        all_metrics = comm.gather(metrics)
        if comm.is_main_process():
            storage = get_event_storage()
            data_time = np.max([x.pop("data_time") for x in all_metrics])
            storage.put_scalar("data_time", data_time, cur_iter=cur_iter)
            metrics_dict = {k: np.mean([x[k] for x in all_metrics]) for k in all_metrics[0].keys()}
            total = metrics_dict.pop("total_loss", sum(metrics_dict.values()))
            if not np.isfinite(total):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={cur_iter}!\nloss_dict = {metrics_dict}"
                )
            storage.put_scalar(f"{prefix}total_loss", total, cur_iter=cur_iter)
            if len(metrics_dict) > 1:
                storage.put_scalars(cur_iter=cur_iter, **metrics_dict)

    def after_train(self):
        if self._pending_metrics is not None:
            it, dt, pending = self._pending_metrics
            try:
                self._write_metrics(pending, dt, cur_iter=it)
            except FloatingPointError:
                pass
            self._pending_metrics = None
        super().after_train()

    def state_dict(self):
        ret = super().state_dict()
        ret["train_state_step"] = int(self.state.step)
        return ret

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)


# On TPU, "AMP" is simply bf16 compute in the model (no GradScaler needed);
# kept as an alias for API parity with the reference's AMPTrainer.
AMPTrainer = SimpleTrainer
