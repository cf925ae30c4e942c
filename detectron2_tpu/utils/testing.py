"""Test helpers (reference detectron2/utils/testing.py)."""

import io
import os
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "get_model_no_weights",
    "random_boxes",
    "get_sample_coco_image",
    "assert_instances_allclose",
    "reload_lazy_config",
]


def get_model_no_weights(config_path: str):
    """Build a model zoo config without loading weights
    (reference testing.py:29). Returns (model, params)."""
    from detectron2_tpu import model_zoo

    return model_zoo.get(config_path, trained=False)


def random_boxes(num_boxes: int, max_coord: int = 100, seed: int = 0) -> np.ndarray:
    """Create valid random XYXY boxes (reference testing.py:42)."""
    rng = np.random.RandomState(seed)
    boxes = rng.rand(num_boxes, 4) * (max_coord * 0.5)
    boxes = np.abs(boxes)
    boxes[:, 2:] += boxes[:, :2]
    return boxes.astype(np.float32)


def get_sample_coco_image(tensor: bool = True) -> np.ndarray:
    """A synthetic sample image (the reference downloads one from the zoo;
    offline here). HWC float32 BGR."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 255, (480, 640, 3)).astype(np.float32)
    return img


def assert_instances_allclose(inst1, inst2, *, rtol: float = 1e-5, msg: str = "", size_as_tensor: bool = False):
    """Assert two host Instances have the same fields with close values
    (reference testing.py:95)."""
    assert inst1.image_size == inst2.image_size, f"{inst1.image_size} != {inst2.image_size} {msg}"
    fields1 = set(inst1.get_fields().keys())
    fields2 = set(inst2.get_fields().keys())
    assert fields1 == fields2, f"{fields1} != {fields2} {msg}"
    for f in fields1:
        v1 = inst1.get(f)
        v2 = inst2.get(f)
        if hasattr(v1, "tensor"):
            v1, v2 = v1.tensor, v2.tensor
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=rtol, err_msg=f"field {f} {msg}")


def reload_lazy_config(cfg):
    """Save a lazy config to a temp file and load it back, testing
    serializability (reference testing.py:153)."""
    import tempfile

    from detectron2_tpu.config import LazyConfig

    with tempfile.TemporaryDirectory(prefix="detectron2_tpu") as d:
        fname = os.path.join(d, "d2_cfg_test.yaml")
        LazyConfig.save(cfg, fname)
        return LazyConfig.load(fname)
