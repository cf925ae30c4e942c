"""detection_utils semantics (reference tests/data/test_detection_utils.py):
annotation transforms, keypoint hflip index swaps, instances conversion,
empty filtering, image format conversion."""

import numpy as np
import pytest

from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.data.detection_utils import (
    annotations_to_instances,
    convert_image_to_rgb,
    create_keypoint_hflip_indices,
    filter_empty_instances,
    transform_instance_annotations,
)
from detectron2_tpu.structures import BoxMode


def _anno():
    return {
        "bbox": [10.0, 10.0, 30.0, 20.0],
        "bbox_mode": BoxMode.XYXY_ABS,
        "category_id": 3,
        "segmentation": [[10.0, 10.0, 30.0, 10.0, 30.0, 20.0, 10.0, 20.0]],
        "keypoints": [12.0, 12.0, 2, 28.0, 18.0, 2],
    }


def test_transform_instance_annotations_hflip():
    tfm = T.HFlipTransform(64)
    out = transform_instance_annotations(
        _anno(), T.TransformList([tfm]), (40, 64), keypoint_hflip_indices=np.array([1, 0])
    )
    # box mirrored: x0' = 64 - 30, x1' = 64 - 10
    np.testing.assert_allclose(out["bbox"], [34.0, 10.0, 54.0, 20.0])
    assert out["bbox_mode"] == BoxMode.XYXY_ABS
    # polygon x coords mirrored
    poly = np.asarray(out["segmentation"][0]).reshape(-1, 2)
    np.testing.assert_allclose(sorted(poly[:, 0]), [34.0, 34.0, 54.0, 54.0])
    # keypoints mirrored AND left/right indices swapped
    kpts = np.asarray(out["keypoints"]).reshape(-1, 3)
    np.testing.assert_allclose(kpts[0, :2], [64.0 - 28.0, 18.0])
    np.testing.assert_allclose(kpts[1, :2], [64.0 - 12.0, 12.0])


def test_annotations_to_instances_and_filter_empty():
    annos = [_anno(), dict(_anno(), bbox=[5.0, 5.0, 5.0, 5.0])]
    # box-only annotations (segmentation omitted)
    inst = annotations_to_instances(
        [{k: v for k, v in a.items() if k != "segmentation"} for a in annos], (40, 64)
    )
    assert len(inst) == 2
    assert inst.gt_classes.tolist() == [3, 3]
    filtered = filter_empty_instances(inst, by_mask=False)
    assert len(filtered) == 1  # the zero-area box is dropped
    np.testing.assert_allclose(np.asarray(filtered.gt_boxes.tensor)[0], [10, 10, 30, 20])


def test_annotations_to_instances_bitmask():
    anno = _anno()
    inst = annotations_to_instances([anno], (40, 64), mask_format="bitmask")
    m = np.asarray(inst.gt_masks.tensor[0])
    assert m.shape == (40, 64)
    # the 20x10 rectangle is filled
    assert m[15, 20] and not m[5, 5]
    assert 150 <= m.sum() <= 250


def test_create_keypoint_hflip_indices():
    name = "kpt_hflip_test_dataset"
    meta = MetadataCatalog.get(name)
    if not hasattr(meta, "keypoint_names"):
        meta.set(
            keypoint_names=["nose", "left_eye", "right_eye"],
            keypoint_flip_map=[("left_eye", "right_eye")],
        )
    idx = create_keypoint_hflip_indices([name])
    np.testing.assert_array_equal(idx, [0, 2, 1])


def test_convert_image_to_rgb():
    bgr = np.zeros((4, 4, 3), np.uint8)
    bgr[..., 0] = 255  # blue channel in BGR
    rgb = convert_image_to_rgb(bgr, "BGR")
    assert rgb[0, 0, 2] == 255 and rgb[0, 0, 0] == 0
    rgb2 = convert_image_to_rgb(rgb.astype(np.float32), "RGB")
    np.testing.assert_array_equal(rgb2, rgb)
