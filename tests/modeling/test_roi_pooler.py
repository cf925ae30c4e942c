"""ROIPooler tests (reference tests/modeling/test_roi_pooler.py semantics:
FPN level assignment, multi-level pooling equals per-level pooling, scale
correctness against a directly-computed RoIAlign)."""

import math

import numpy as np
import jax.numpy as jnp

from detectron2_tpu.modeling.poolers import ROIPooler, assign_boxes_to_levels
from detectron2_tpu.ops.roi_align import roi_align


def _box(cx, cy, s):
    return [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2]


def test_level_assignment_fpn_eqn1():
    # canonical 224-sized box -> level 4; each doubling of size moves a level
    boxes = jnp.asarray(
        [
            _box(500, 500, 224),  # -> 4
            _box(500, 500, 448),  # -> 5
            _box(500, 500, 112),  # -> 3
            _box(500, 500, 896),  # -> 5 (clamped)
            _box(500, 500, 20),  # -> 2 (clamped)
            _box(500, 500, 230),  # floor(4 + log2(230/224)) = 4
        ],
        jnp.float32,
    )
    lv = np.asarray(assign_boxes_to_levels(boxes, min_level=2, max_level=5))
    assert lv.tolist() == [2, 3, 1, 3, 0, 2]  # offsets from min_level=2


def test_multilevel_matches_single_level():
    """A box assigned to level L pools exactly what single-level RoIAlign on
    L's feature map produces."""
    rng = np.random.RandomState(11)
    feats = [
        jnp.asarray(rng.standard_normal((2, 64 // 2**i, 80 // 2**i, 8)).astype(np.float32))
        for i in range(4)
    ]  # strides 4, 8, 16, 32
    scales = tuple(1.0 / (4 * 2**i) for i in range(4))
    pooler = ROIPooler(output_size=7, scales=scales, sampling_ratio=2, pooler_type="ROIAlignV2")

    boxes = jnp.asarray(
        [
            _box(120, 100, 224),  # level 4 -> feats[2]
            _box(60, 80, 112),  # level 3 -> feats[1]
            _box(100, 90, 448),  # level 5 -> feats[3]
            _box(40, 50, 40),  # level 2 -> feats[0]
        ],
        jnp.float32,
    )
    batch_idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    out = np.asarray(pooler(feats, boxes, batch_idx))
    assert out.shape == (4, 7, 7, 8)

    expect_level = [2, 1, 3, 0]
    for r, li in enumerate(expect_level):
        ref = np.asarray(
            roi_align(
                feats[li],
                boxes[r : r + 1],
                batch_idx[r : r + 1],
                output_size=(7, 7),
                spatial_scale=scales[li],
                sampling_ratio=2,
                aligned=True,
            )
        )[0]
        np.testing.assert_allclose(out[r], ref, rtol=1e-5, atol=1e-5)


def test_single_level_pooler():
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    pooler = ROIPooler(output_size=5, scales=(0.25,), sampling_ratio=0, pooler_type="ROIAlignV2")
    boxes = jnp.asarray([[8.0, 8.0, 96.0, 96.0]], jnp.float32)
    out = np.asarray(pooler([feat], boxes, jnp.asarray([0], jnp.int32)))
    ref = np.asarray(
        roi_align(feat, boxes, jnp.asarray([0], jnp.int32), (5, 5), 0.25, 0, aligned=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_scale_validation():
    try:
        ROIPooler(7, scales=(0.25, 0.1), sampling_ratio=0, pooler_type="ROIAlignV2")
        assert False, "non-log2-contiguous scales should be rejected"
    except AssertionError:
        pass
