"""Exact anchor values, pinned to the reference's published expected tensors
(reference tests/modeling/test_anchor_generator.py). These are the AP-parity
ground truth for anchor layout: any deviation shifts every box downstream.
"""

import numpy as np

from detectron2_tpu.config import get_cfg
from detectron2_tpu.layers import ShapeSpec
from detectron2_tpu.modeling.anchor_generator import (
    DefaultAnchorGenerator,
    RotatedAnchorGenerator,
)


def test_default_anchor_generator_exact():
    cfg = get_cfg()
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.25, 1, 4]]

    gen = DefaultAnchorGenerator(cfg, [ShapeSpec(stride=4)])
    anchors = gen([(1, 2)])  # feature map H=1, W=2

    # reference tests/modeling/test_anchor_generator.py:26-41 (OFFSET=0.0)
    expected = np.array(
        [
            [-32.0, -8.0, 32.0, 8.0],
            [-16.0, -16.0, 16.0, 16.0],
            [-8.0, -32.0, 8.0, 32.0],
            [-64.0, -16.0, 64.0, 16.0],
            [-32.0, -32.0, 32.0, 32.0],
            [-16.0, -64.0, 16.0, 64.0],
            [-28.0, -8.0, 36.0, 8.0],  # -28.0 == -32.0 + STRIDE (4)
            [-12.0, -16.0, 20.0, 16.0],
            [-4.0, -32.0, 12.0, 32.0],
            [-60.0, -16.0, 68.0, 16.0],
            [-28.0, -32.0, 36.0, 32.0],
            [-12.0, -64.0, 20.0, 64.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(anchors[0]), expected, atol=1e-5)


def test_default_anchor_generator_centered_exact():
    gen = DefaultAnchorGenerator(sizes=[32, 64], aspect_ratios=[0.25, 1, 4], strides=[4])
    assert gen.offset == 0.5
    anchors = gen([(1, 2)])

    # reference tests/modeling/test_anchor_generator.py:54-69 (offset=0.5)
    expected = np.array(
        [
            [-30.0, -6.0, 34.0, 10.0],
            [-14.0, -14.0, 18.0, 18.0],
            [-6.0, -30.0, 10.0, 34.0],
            [-62.0, -14.0, 66.0, 18.0],
            [-30.0, -30.0, 34.0, 34.0],
            [-14.0, -62.0, 18.0, 66.0],
            [-26.0, -6.0, 38.0, 10.0],
            [-10.0, -14.0, 22.0, 18.0],
            [-2.0, -30.0, 14.0, 34.0],
            [-58.0, -14.0, 70.0, 18.0],
            [-26.0, -30.0, 38.0, 34.0],
            [-10.0, -62.0, 22.0, 66.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(anchors[0]), expected, atol=1e-5)


def test_rotated_anchor_generator_exact():
    cfg = get_cfg()
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.25, 1, 4]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [0, 45]

    gen = RotatedAnchorGenerator(cfg, [ShapeSpec(stride=4)])
    anchors = gen([(1, 2)])

    # reference tests/modeling/test_anchor_generator.py:88-115
    expected = np.array(
        [
            [0.0, 0.0, 64.0, 16.0, 0.0],
            [0.0, 0.0, 64.0, 16.0, 45.0],
            [0.0, 0.0, 32.0, 32.0, 0.0],
            [0.0, 0.0, 32.0, 32.0, 45.0],
            [0.0, 0.0, 16.0, 64.0, 0.0],
            [0.0, 0.0, 16.0, 64.0, 45.0],
            [0.0, 0.0, 128.0, 32.0, 0.0],
            [0.0, 0.0, 128.0, 32.0, 45.0],
            [0.0, 0.0, 64.0, 64.0, 0.0],
            [0.0, 0.0, 64.0, 64.0, 45.0],
            [0.0, 0.0, 32.0, 128.0, 0.0],
            [0.0, 0.0, 32.0, 128.0, 45.0],
            [4.0, 0.0, 64.0, 16.0, 0.0],  # 4.0 == 0.0 + STRIDE (4)
            [4.0, 0.0, 64.0, 16.0, 45.0],
            [4.0, 0.0, 32.0, 32.0, 0.0],
            [4.0, 0.0, 32.0, 32.0, 45.0],
            [4.0, 0.0, 16.0, 64.0, 0.0],
            [4.0, 0.0, 16.0, 64.0, 45.0],
            [4.0, 0.0, 128.0, 32.0, 0.0],
            [4.0, 0.0, 128.0, 32.0, 45.0],
            [4.0, 0.0, 64.0, 64.0, 0.0],
            [4.0, 0.0, 64.0, 64.0, 45.0],
            [4.0, 0.0, 32.0, 128.0, 0.0],
            [4.0, 0.0, 32.0, 128.0, 45.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(anchors[0]), expected, atol=1e-5)
