"""Mask structure tests (reference tests/structures/test_masks.py semantics:
rasterization area, crop_and_resize, bounding boxes, PolygonMasks views)."""

import numpy as np

from detectron2_tpu.structures import BitMasks, Boxes, PolygonMasks
from detectron2_tpu.structures.masks import (
    polygon_area,
    polygons_to_bitmask,
    rasterize_polygons_within_box,
)


def _rect_poly(x0, y0, x1, y1):
    return np.array([x0, y0, x1, y0, x1, y1, x0, y1], np.float32)


def test_polygon_area():
    assert abs(polygon_area(np.array([0, 10, 10, 0.0]), np.array([0, 0, 10, 10.0])) - 100) < 1e-6
    # triangle
    assert abs(polygon_area(np.array([0, 4, 0.0]), np.array([0, 0, 3.0])) - 6) < 1e-6


def test_polygons_to_bitmask_rect():
    mask = polygons_to_bitmask([_rect_poly(2, 3, 8, 7)], 10, 12)
    assert mask.shape == (10, 12) and mask.dtype == bool
    area = mask.sum()
    # COCO fill rule rasterizes a 6x4 rect to ~(6+1)*(4+1) pixels (inclusive
    # boundary); allow the rasterizer's boundary convention either way
    assert 6 * 4 <= area <= 7 * 5, area
    assert mask[5, 5] and not mask[0, 0]
    assert polygons_to_bitmask([], 4, 4).sum() == 0


def test_rasterize_polygons_within_box_full_and_crop():
    poly = [_rect_poly(4, 4, 12, 12)]
    # crop by the polygon's own bbox: mask fills the whole output
    full = rasterize_polygons_within_box(poly, np.array([4, 4, 12, 12], np.float32), 8)
    assert full.shape == (8, 8)
    assert full.mean() > 0.9
    # crop by a box covering only the left half
    half = rasterize_polygons_within_box(poly, np.array([0, 4, 16, 12], np.float32), 8)
    assert half[:, 2:6].mean() > 0.9  # polygon occupies middle columns
    assert half[:, 0].sum() == 0


def test_bitmasks_crop_and_resize_identity():
    rng = np.random.RandomState(3)
    masks = np.zeros((2, 32, 32), bool)
    masks[0, 8:24, 8:24] = True
    masks[1, 4:12, 16:28] = True
    bm = BitMasks(masks)
    boxes = bm.get_bounding_boxes()
    np.testing.assert_allclose(np.asarray(boxes.tensor), [[8, 8, 24, 24], [16, 4, 28, 12]])
    crops = np.asarray(bm.crop_and_resize(boxes, 14))
    assert crops.shape == (2, 14, 14)
    # cropping a solid rectangle by its own tight box gives a (nearly) full crop
    assert crops[0].mean() > 0.95
    assert crops[1].mean() > 0.95


def test_bitmasks_nonempty_len_getitem_cat():
    masks = np.zeros((3, 8, 8), bool)
    masks[0, 2:4, 2:4] = True
    bm = BitMasks(masks)
    assert bm.nonempty().tolist() == [True, False, False]
    assert len(bm) == 3
    assert len(bm[np.array([0, 2])]) == 2
    assert len(BitMasks.cat([bm, bm])) == 6


def test_polygon_masks_views():
    pm = PolygonMasks([[_rect_poly(0, 0, 4, 4)], [_rect_poly(2, 2, 8, 6)]])
    assert len(pm) == 2
    boxes = np.asarray(pm.get_bounding_boxes().tensor)
    np.testing.assert_allclose(boxes, [[0, 0, 4, 4], [2, 2, 8, 6]])
    assert pm.nonempty().tolist() == [True, True]
    sub = pm[[1]]
    assert len(sub) == 1
    bm = BitMasks.from_polygon_masks(pm, 10, 10)
    assert bm.tensor.shape == (2, 10, 10)
    assert bm.nonempty().tolist() == [True, True]


def test_polygon_masks_empty():
    pm = PolygonMasks([])
    assert len(pm) == 0
    bm = BitMasks.from_polygon_masks(pm, 6, 6)
    assert bm.tensor.shape == (0, 6, 6)
