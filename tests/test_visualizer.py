"""Visualizer tests (role of reference tests/test_visualizer.py): drawing
instances / dataset dicts / sem-seg / panoptic must produce a valid image of
the right size and actually change pixels."""

import numpy as np
import pytest

from detectron2_tpu.structures import Boxes, Instances
from detectron2_tpu.utils.visualizer import GenericMask, Visualizer


def _img(h=64, w=80):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (h, w, 3)).astype(np.uint8)


def _instances(h=64, w=80, with_masks=True):
    inst = Instances((h, w))
    inst.pred_boxes = Boxes(np.array([[5, 5, 30, 40], [40, 10, 70, 50]], np.float32))
    inst.scores = np.array([0.9, 0.7], np.float32)
    inst.pred_classes = np.array([0, 1], np.int64)
    if with_masks:
        masks = np.zeros((2, h, w), bool)
        masks[0, 10:35, 8:28] = True
        masks[1, 15:45, 45:65] = True
        inst.pred_masks = _MaskWrapper(masks)
    return inst


class _MaskWrapper:
    """Minimal object exposing .tensor like BitMasks for the visualizer."""

    def __init__(self, arr):
        self.tensor = arr

    def __len__(self):
        return len(self.tensor)

    def __getitem__(self, item):
        return _MaskWrapper(self.tensor[item])


def test_draw_instance_predictions():
    img = _img()
    vis = Visualizer(img)
    out = vis.draw_instance_predictions(_instances())
    rendered = out.get_image()
    assert rendered.shape == img.shape
    assert rendered.dtype == np.uint8
    assert (rendered != img).any(), "drawing must change pixels"


def test_draw_dataset_dict():
    from detectron2_tpu.structures import BoxMode

    img = _img()
    dic = {
        "annotations": [
            {"bbox": [5, 5, 25, 35], "bbox_mode": BoxMode.XYWH_ABS, "category_id": 0},
            {"bbox": [40, 10, 30, 40], "bbox_mode": BoxMode.XYWH_ABS, "category_id": 1},
        ]
    }
    out = Visualizer(img).draw_dataset_dict(dic)
    assert (out.get_image() != img).any()


def test_draw_sem_seg():
    img = _img()
    sem = np.zeros((64, 80), np.uint8)
    sem[10:40, 10:40] = 1
    sem[40:60, 50:70] = 2
    out = Visualizer(img).draw_sem_seg(sem)
    assert (out.get_image() != img).any()


def test_draw_panoptic_seg():
    img = _img()
    pan = np.zeros((64, 80), np.int32)
    pan[5:30, 5:30] = 1001
    pan[35:60, 40:75] = 2001
    segments_info = [
        {"id": 1001, "category_id": 0, "isthing": True},
        {"id": 2001, "category_id": 1, "isthing": False},
    ]
    out = Visualizer(img).draw_panoptic_seg(pan, segments_info)
    assert (out.get_image() != img).any()


def test_generic_mask_polygons_roundtrip():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    gm = GenericMask(m, 32, 32)
    assert gm.area() == 16 * 16
    np.testing.assert_array_equal(gm.bbox(), [8, 8, 24, 24])
    polys = gm.polygons
    assert len(polys) >= 1


def test_empty_instances_no_crash():
    img = _img()
    inst = Instances((64, 80))
    inst.pred_boxes = Boxes(np.zeros((0, 4), np.float32))
    inst.scores = np.zeros((0,), np.float32)
    inst.pred_classes = np.zeros((0,), np.int64)
    out = Visualizer(img).draw_instance_predictions(inst)
    assert out.get_image().shape == img.shape
