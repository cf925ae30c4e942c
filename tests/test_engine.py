"""Engine tests: SimpleTrainer loop with a trivial model, hooks, checkpointing
(reference tests/test_engine.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from detectron2_tpu.engine import hooks
from detectron2_tpu.engine.train_loop import SimpleTrainer
from detectron2_tpu.parallel import TrainState, make_train_step


class _ToyModel(nn.Module):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        w = self.param("w", nn.initializers.ones, (4,))
        pred = (batch["x"] * w).sum(-1)
        if train:
            return {"loss_mse": ((pred - batch["y"]) ** 2).mean()}
        return pred


def _make_trainer(max_iter=10, out_dir=None):
    model = _ToyModel()
    rng = np.random.RandomState(0)

    def loader():
        while True:
            x = rng.rand(8, 4).astype(np.float32)
            yield {"x": jnp.asarray(x), "y": jnp.asarray((x * 2).sum(-1))}

    batch = next(loader())
    params = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = optax.sgd(0.05)
    state = TrainState.create(params, tx)
    step = make_train_step(model)
    return SimpleTrainer(step, loader(), state), model


def test_simple_trainer_decreases_loss():
    trainer, _ = _make_trainer()
    losses = []

    class Recorder(hooks.HookBase):
        def after_step(self):
            if trainer._pending_metrics is not None:
                _, _, pending = trainer._pending_metrics
                losses.append(float(np.asarray(pending["total_loss"])))

    trainer.register_hooks([Recorder()])
    trainer.train(0, 50)
    assert losses[-1] < losses[0] * 0.5
    assert int(trainer.state.step) == 50


def test_hooks_called_in_order():
    trainer, _ = _make_trainer()
    calls = []
    trainer.register_hooks(
        [
            hooks.CallbackHook(
                before_train=lambda t: calls.append("bt"),
                before_step=lambda t: calls.append("bs"),
                after_step=lambda t: calls.append("as"),
                after_train=lambda t: calls.append("at"),
            )
        ]
    )
    trainer.train(0, 3)
    assert calls[0] == "bt" and calls[-1] == "at"
    assert calls[1:-1] == ["bs", "as"] * 3


def test_iteration_timer_and_writers(tmp_path):
    from detectron2_tpu.utils.events import JSONWriter

    trainer, _ = _make_trainer()
    json_file = str(tmp_path / "metrics.json")
    trainer.register_hooks(
        [hooks.IterationTimer(), hooks.PeriodicWriter([JSONWriter(json_file, window_size=1)], period=2)]
    )
    trainer.train(0, 6)
    assert os.path.exists(json_file)
    import json as _json

    lines = [l for l in open(json_file) if l.strip()]
    assert len(lines) > 0
    # metrics are written with a one-step delay; total_loss must appear in
    # some written record
    assert any("total_loss" in _json.loads(l) for l in lines)


def test_checkpoint_roundtrip(tmp_path):
    from detectron2_tpu.checkpoint import DetectionCheckpointer

    trainer, model = _make_trainer()
    trainer.train(0, 5)
    w_after = np.asarray(trainer.state.params["params"]["w"]).copy()

    cp = DetectionCheckpointer(trainer.state, str(tmp_path))
    cp.save("model_test")
    assert cp.has_checkpoint()

    # fresh state, load back
    trainer2, _ = _make_trainer()
    cp2 = DetectionCheckpointer(trainer2.state, str(tmp_path))
    extra = cp2.load(cp2.get_checkpoint_file())
    loaded_w = np.asarray(cp2.params.params["params"]["w"])
    np.testing.assert_allclose(loaded_w, w_after)


def test_eval_hook():
    trainer, _ = _make_trainer()
    results = []

    def eval_fn():
        results.append(trainer.iter)
        return {"bbox": {"AP": 42.0}}

    trainer.register_hooks([hooks.EvalHook(2, eval_fn)])
    trainer.train(0, 6)
    # called at iters 1, 3 (periodic, skipping final) and at train end
    assert len(results) == 3
    assert trainer.storage.latest()["bbox/AP"][0] == 42.0
