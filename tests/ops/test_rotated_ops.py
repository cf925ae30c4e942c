import numpy as np
import pytest

import jax.numpy as jnp

from detectron2_tpu.ops.rotated_boxes_ops import (
    nms_rotated_padded,
    pairwise_iou_rotated,
)


def test_identical_boxes():
    b = jnp.asarray([[10.0, 10.0, 4.0, 6.0, 30.0]])
    iou = np.asarray(pairwise_iou_rotated(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_axis_aligned_matches_normal_iou():
    b1 = jnp.asarray([[5.0, 5.0, 10.0, 10.0, 0.0]])
    b2 = jnp.asarray([[10.0, 10.0, 10.0, 10.0, 0.0]])
    # xyxy: [0,0,10,10] vs [5,5,15,15] -> inter 25, union 175
    iou = np.asarray(pairwise_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[25.0 / 175.0]], atol=1e-5)


def test_rotation_90_symmetric_box():
    # square box rotated 90 deg is identical
    b1 = jnp.asarray([[0.0, 0.0, 4.0, 4.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 4.0, 4.0, 90.0]])
    iou = np.asarray(pairwise_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)


def test_rotation_45():
    # unit square vs itself rotated 45 deg about the same center:
    # intersection is a regular octagon with area 4*(sqrt(2)-1) for a 2x2 square... use known result:
    # For square side s, intersection area = s^2 * (2*(sqrt(2)-1)) ≈ 0.8284 s^2
    s = 2.0
    b1 = jnp.asarray([[0.0, 0.0, s, s, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, s, s, 45.0]])
    iou = np.asarray(pairwise_iou_rotated(b1, b2))[0, 0]
    inter = s * s * 2 * (np.sqrt(2) - 1)
    expected = inter / (2 * s * s - inter)
    np.testing.assert_allclose(iou, expected, atol=1e-4)


def test_disjoint():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 10.0]])
    b2 = jnp.asarray([[100.0, 100.0, 2.0, 2.0, 70.0]])
    iou = np.asarray(pairwise_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[0.0]])


def test_containment():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 17.0]])
    b2 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 53.0]])
    iou = np.asarray(pairwise_iou_rotated(b1, b2))
    np.testing.assert_allclose(iou, [[4.0 / 100.0]], atol=1e-5)


def test_many_pairs_shape():
    rng = np.random.RandomState(0)
    b1 = np.column_stack(
        [rng.rand(13) * 50, rng.rand(13) * 50, rng.rand(13) * 10 + 1, rng.rand(13) * 10 + 1, rng.rand(13) * 360 - 180]
    ).astype(np.float32)
    b2 = np.column_stack(
        [rng.rand(7) * 50, rng.rand(7) * 50, rng.rand(7) * 10 + 1, rng.rand(7) * 10 + 1, rng.rand(7) * 360 - 180]
    ).astype(np.float32)
    iou = np.asarray(pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert iou.shape == (13, 7)
    assert (iou >= -1e-6).all() and (iou <= 1 + 1e-6).all()
    # symmetric check on the transpose computation
    iou_t = np.asarray(pairwise_iou_rotated(jnp.asarray(b2), jnp.asarray(b1)))
    np.testing.assert_allclose(iou, iou_t.T, atol=1e-4)


def test_nms_rotated():
    boxes = jnp.asarray(
        [
            [10.0, 10.0, 8.0, 8.0, 0.0],
            [10.5, 10.5, 8.0, 8.0, 2.0],  # overlaps first heavily
            [40.0, 40.0, 8.0, 8.0, 45.0],
        ]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated_padded(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])
