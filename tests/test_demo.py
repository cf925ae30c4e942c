"""Demo-pipeline tests (role of reference demo usage in
dev/run_inference_tests.sh): the AsyncPredictor's ordered pipelining and the
VisualizationDemo image path, with the heavy DefaultPredictor stubbed (model
e2e is covered by tests/modeling/)."""

import sys
import time

import numpy as np
import pytest


@pytest.fixture()
def demo_modules(monkeypatch):
    sys.path.insert(0, "demo")
    import predictor as predictor_mod

    class FakePredictor:
        def __init__(self, cfg):
            self.calls = 0

        def __call__(self, image):
            self.calls += 1
            time.sleep(0.005)
            from detectron2_tpu.structures import Boxes, Instances

            inst = Instances(image.shape[:2])
            inst.pred_boxes = Boxes(np.array([[1.0, 2.0, 20.0, 30.0]], np.float32))
            inst.scores = np.array([float(image[0, 0, 0]) / 255.0], np.float32)
            inst.pred_classes = np.array([0], np.int64)
            return {"instances": inst}

    monkeypatch.setattr(predictor_mod, "DefaultPredictor", FakePredictor)
    yield predictor_mod
    sys.path.remove("demo")


def test_async_predictor_preserves_order(demo_modules):
    ap = demo_modules.AsyncPredictor.__new__(demo_modules.AsyncPredictor)
    demo_modules.AsyncPredictor.__init__(ap, cfg=None)
    try:
        imgs = []
        for i in range(8):
            img = np.full((16, 16, 3), i * 10, np.uint8)
            imgs.append(img)
            ap.put(img)
        outs = [ap.get() for _ in range(8)]
        scores = [float(o["instances"].scores[0]) for o in outs]
        np.testing.assert_allclose(scores, [i * 10 / 255.0 for i in range(8)], rtol=1e-6)
        assert len(ap) == 0
    finally:
        ap.shutdown()


def test_visualization_demo_run_on_image(demo_modules, monkeypatch):
    demo = demo_modules.VisualizationDemo.__new__(demo_modules.VisualizationDemo)
    from detectron2_tpu.data import MetadataCatalog
    from detectron2_tpu.utils.visualizer import ColorMode

    demo.metadata = MetadataCatalog.get("__demo_test__")
    demo.cpu_device = None
    demo.instance_mode = ColorMode.IMAGE
    demo.parallel = False
    demo.predictor = demo_modules.DefaultPredictor(None)

    img = np.random.RandomState(0).randint(0, 255, (32, 48, 3), np.uint8)
    predictions, vis = demo.run_on_image(img)
    assert "instances" in predictions
    out = vis.get_image()
    assert out.shape[:2] == (32, 48)
