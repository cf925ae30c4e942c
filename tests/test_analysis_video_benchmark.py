"""Coverage for the last untested utility modules: utils/analysis (flop and
parameter counting, reference tests/test_model_analysis.py),
utils/video_visualizer (stable instance colors across frames), and
data/benchmark (loader throughput helper)."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.utils.analysis import (
    FlopCountAnalysis,
    flop_count_operators,
    parameter_count,
    parameter_count_table,
)


def test_parameter_count_exact():
    params = {
        "params": {
            "backbone": {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros((8,))}},
            "head": {"fc": {"kernel": jnp.zeros((8, 2))}},
        }
    }
    counts = parameter_count(params)
    assert counts[""] == 3 * 3 * 4 * 8 + 8 + 8 * 2
    # per-subtree totals, like fvcore's parameter_count
    assert any("backbone" in k and v == 296 for k, v in counts.items()), counts
    table = parameter_count_table(params)
    assert "backbone" in table


def test_flop_count_matmul():
    """XLA's cost analysis pins a matmul at 2*M*N*K flops."""
    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)

    def fn(a, b):
        return a @ b

    fc = FlopCountAnalysis(fn, (a, b))
    assert fc.total() == 2 * 64 * 128 * 32
    assert fc.bytes_accessed() > 0
    ops = flop_count_operators(fn, (a, b))
    assert sum(ops.values()) > 0


def test_mfu_helpers():
    """compile_with_flops reports the exact XLA flop count of the compiled
    executable, and mfu() divides achieved by the per-chip peak (None on the
    CPU backend, an unknown device_kind)."""
    from detectron2_tpu.utils.analysis import compile_with_flops, mfu, tpu_peak_flops

    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)
    compiled, flops = compile_with_flops(lambda a, b: a @ b, a, b)
    assert flops == 2 * 64 * 128 * 32
    np.testing.assert_allclose(np.asarray(compiled(a, b)), 0.0)

    class FakeDev:
        device_kind = "TPU v5 lite"

    assert tpu_peak_flops(FakeDev()) == 197e12
    assert tpu_peak_flops(FakeDev(), dtype="float32") == 98.5e12
    # 197e12 flops in 2 seconds on a 197e12-peak chip = 50% MFU
    assert abs(mfu(197e12, 2.0, device=FakeDev()) - 0.5) < 1e-9
    if jax.devices()[0].platform == "cpu":
        assert tpu_peak_flops() is None and mfu(1e12, 1.0) is None


def test_video_visualizer_stable_colors():
    from detectron2_tpu.utils.video_visualizer import VideoVisualizer

    class Meta:
        thing_classes = ["a", "b"]

        def get(self, k, default=None):
            return getattr(self, k, default)

    from detectron2_tpu.structures import Boxes, Instances

    vis = VideoVisualizer(Meta())
    frame = np.zeros((64, 64, 3), np.uint8)
    preds1 = Instances(
        (64, 64),
        pred_boxes=Boxes(np.array([[4, 4, 20, 20], [30, 30, 50, 50]], np.float32)),
        scores=np.array([0.9, 0.8], np.float32),
        pred_classes=np.array([0, 1], np.int32),
    )
    out1 = vis.draw_instance_predictions(frame, preds1)
    colors1 = [list(i.color) for i in vis._old_instances[:2]]
    # same detections next frame -> identical tracked colors (extras past the
    # first two are ttl-surviving copies of the previous frame)
    out2 = vis.draw_instance_predictions(frame, preds1)
    colors2 = [list(i.color) for i in vis._old_instances[:2]]
    assert colors1 == colors2
    assert out1.get_image().shape == (64, 64, 3)
    assert (out2.get_image() != frame).any()


def test_dataloader_benchmark_smoke(capsys):
    from detectron2_tpu.data.benchmark import DataLoaderBenchmark

    dataset = [
        {"file_name": f"{i}.jpg", "image_id": i, "height": 8, "width": 8, "annotations": []}
        for i in range(16)
    ]

    def mapper(d):
        return {"image": np.zeros((8, 8, 3), np.float32), "image_id": d["image_id"]}

    bench = DataLoaderBenchmark(dataset, mapper=mapper, total_batch_size=4, num_workers=0)
    bench.benchmark_dataset(num_iter=8, warmup=2)
    bench.benchmark_mapper(num_iter=8, warmup=2)
