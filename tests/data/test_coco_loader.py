"""COCO json round-trip + DatasetMapper + PaddedBatchCollator golden-shape
tests (the role of reference tests/data/test_coco.py + test_dataset.py):
everything between a COCO json on disk and the fixed-shape batch the compiled
step consumes."""

import json
import os

import numpy as np
import pytest

from detectron2_tpu.data import DatasetCatalog, DatasetMapper, MetadataCatalog
from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.build import PaddedBatchCollator
from detectron2_tpu.data.datasets.coco import load_coco_json, register_coco_instances


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    """Write a 2-image COCO dataset (PNG images + instances json) to disk."""
    import cv2

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    sizes = [(60, 80), (48, 64)]
    images, annotations = [], []
    ann_id = 1
    for i, (h, w) in enumerate(sizes):
        fname = f"img{i}.png"
        cv2.imwrite(str(img_dir / fname), rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for j in range(2):
            x, y, bw, bh = 5 + 10 * j, 5 + 5 * j, 20, 15
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": (j % 2) + 1,
                    "bbox": [x, y, bw, bh],
                    "area": bw * bh,
                    "iscrowd": 0,
                    "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
                }
            )
            ann_id += 1
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    json_path = root / "instances.json"
    with open(json_path, "w") as f:
        json.dump(data, f)
    return str(json_path), str(img_dir)


def test_load_coco_json_roundtrip(coco_dir):
    json_path, img_dir = coco_dir
    dicts = load_coco_json(json_path, img_dir, "_test_coco_roundtrip_x")
    assert len(dicts) == 2
    d = dicts[0]
    assert d["height"] == 60 and d["width"] == 80
    assert len(d["annotations"]) == 2
    ann = d["annotations"][0]
    assert ann["bbox"] == [5, 5, 20, 15]
    assert "bbox_mode" in ann and "segmentation" in ann
    # category ids mapped to contiguous [0, C)
    cats = {a["category_id"] for dd in dicts for a in dd["annotations"]}
    assert cats == {0, 1}
    meta = MetadataCatalog.get("_test_coco_roundtrip_x")
    assert meta.thing_classes == ["cat", "dog"]


def test_register_and_mapper_and_collator(coco_dir):
    json_path, img_dir = coco_dir
    name = "_test_coco_pipeline"
    if name not in DatasetCatalog.list():
        register_coco_instances(name, {}, json_path, img_dir)
    dicts = DatasetCatalog.get(name)

    mapper = DatasetMapper(
        is_train=True,
        augmentations=[T.ResizeShortestEdge(32, 64), T.RandomFlip(prob=1.0)],
        image_format="BGR",
        use_instance_mask=True,
    )
    mapped = [mapper(d) for d in dicts]
    for m in mapped:
        assert m["image"].ndim == 3 and m["image"].shape[2] == 3
        assert "instances" in m and len(m["instances"]) == 2

    collator = PaddedBatchCollator(size_divisibility=32, max_gt_instances=8, mask_size=28)
    batch = collator(mapped)
    B = 2
    assert batch["image"].shape[0] == B
    assert batch["image"].shape[1] % 32 == 0 and batch["image"].shape[2] % 32 == 0
    assert batch["gt_boxes"].shape == (B, 8, 4)
    assert batch["gt_classes"].shape == (B, 8)
    assert batch["gt_valid"].shape == (B, 8)
    assert batch["gt_masks"].shape == (B, 8, 28, 28)
    # exactly 2 valid instances per image; padding slots invalid
    assert batch["gt_valid"].sum() == 2 * B
    # true sizes recorded, not padded sizes
    assert (np.asarray(batch["image_sizes"]) <= batch["image"].shape[1:3]).all()
    # boxes of valid slots stay inside the (resized) image
    for b in range(B):
        h, w = np.asarray(batch["image_sizes"][b])
        boxes = np.asarray(batch["gt_boxes"][b][np.asarray(batch["gt_valid"][b])])
        assert (boxes[:, 0::2] <= w + 1e-3).all() and (boxes[:, 1::2] <= h + 1e-3).all()


def test_mapper_eval_mode_strips_annotations(coco_dir):
    json_path, img_dir = coco_dir
    dicts = load_coco_json(json_path, img_dir)
    mapper = DatasetMapper(
        is_train=False,
        augmentations=[T.ResizeShortestEdge(32, 64)],
        image_format="BGR",
    )
    m = mapper(dicts[0])
    assert "instances" not in m or m.get("instances") is None or len(m["instances"]) == 0
    assert m["height"] == 60 and m["width"] == 80  # original size kept for postprocess


def test_builtin_registration_breadth():
    """All builtin dataset families register (reference builtin.py:101-259):
    COCO (+panoptic both flavors), LVIS v0.5/v1, Cityscapes (instance+semseg),
    PascalVOC, ADE20k."""
    from detectron2_tpu.data import DatasetCatalog, MetadataCatalog

    registered = set(MetadataCatalog.list())
    for name in [
        "coco_2017_train",
        "coco_2017_val_100",
        "keypoints_coco_2017_val_100",
        "coco_2017_val_panoptic",
        "coco_2017_val_panoptic_separated",
        "lvis_v1_train",
        "lvis_v0.5_val",
        "lvis_v0.5_val_cocofied",
        "cityscapes_fine_instance_seg_train",
        "cityscapes_fine_sem_seg_val",
        "voc_2007_test",
        "voc_2012_trainval",
        "ade20k_sem_seg_train",
        "ade20k_sem_seg_val",
    ]:
        assert name in registered, name
        assert name in DatasetCatalog.list(), name

    assert MetadataCatalog.get("voc_2007_test").evaluator_type == "pascal_voc"
    assert MetadataCatalog.get("cityscapes_fine_instance_seg_val").evaluator_type == "cityscapes_instance"
    assert len(MetadataCatalog.get("ade20k_sem_seg_val").stuff_classes) == 150
