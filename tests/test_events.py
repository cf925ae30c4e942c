import json
import os
import tempfile

from detectron2_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
    get_event_storage,
    has_event_storage,
)


def test_scalar_storage():
    with EventStorage() as storage:
        assert has_event_storage()
        assert get_event_storage() is storage
        for i in range(10):
            storage.put_scalar("loss", i, smoothing_hint=True)
            storage.step()
        assert storage.history("loss").latest() == 9
        assert storage.history("loss").global_avg() == 4.5
    assert not has_event_storage()


def test_json_writer(tmp_path):
    json_file = str(tmp_path / "metrics.json")
    with EventStorage() as storage:
        writer = JSONWriter(json_file, window_size=1)
        for i in range(3):
            storage.put_scalar("key", i, smoothing_hint=False)
            writer.write()
            storage.step()
        writer.close()
    with open(json_file) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert len(lines) == 3
    assert lines[-1]["key"] == 2


def test_name_scope():
    with EventStorage() as storage:
        with storage.name_scope("train"):
            storage.put_scalar("loss", 1.0)
        storage.put_scalar("loss", 2.0)
        assert storage.history("train/loss").latest() == 1.0
        assert storage.history("loss").latest() == 2.0


def test_jax_scalar():
    import jax.numpy as jnp

    with EventStorage() as storage:
        storage.put_scalar("x", jnp.float32(3.5))
        assert storage.history("x").latest() == 3.5


def test_common_metric_printer():
    with EventStorage() as storage:
        printer = CommonMetricPrinter(max_iter=10)
        storage.put_scalar("loss", 1.0)
        storage.put_scalar("time", 0.1)
        storage.put_scalar("lr", 0.01)
        printer.write()  # should not crash


def test_registry():
    from detectron2_tpu.utils.registry import Registry, locate

    REG = Registry("TEST")

    @REG.register()
    class Thing:
        pass

    assert REG.get("Thing") is Thing
    assert "Thing" in REG
    obj = locate("detectron2_tpu.utils.registry.Registry")
    assert obj is Registry


def test_comm_single_process():
    from detectron2_tpu.utils import comm

    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather(5) == [5]
    d = comm.reduce_dict({"x": 1.0})
    assert d["x"] == 1.0
