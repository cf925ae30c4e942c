"""LVIS training-recipe integration: a synthetic LVIS v1 json drives
load_lvis_json -> RepeatFactor sampling -> federated-loss class weights,
the exact chain the LVIS/ViTDet configs instantiate."""

import json

import numpy as np

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.data.datasets.lvis import load_lvis_json, register_lvis_instances
from detectron2_tpu.data.detection_utils import get_fed_loss_cls_weights
from detectron2_tpu.data.samplers import RepeatFactorTrainingSampler


def _lvis_json(tmp_path):
    """3 categories: frequent (9 images), common (3), rare (1)."""
    images = [
        {"id": i, "width": 64, "height": 64, "coco_url": f"http://x/{i:04d}.jpg"}
        for i in range(10)
    ]
    categories = [
        {"id": 1, "name": "freq", "frequency": "f", "image_count": 9, "instance_count": 9},
        {"id": 2, "name": "comm", "frequency": "c", "image_count": 3, "instance_count": 3},
        {"id": 3, "name": "rare", "frequency": "r", "image_count": 1, "instance_count": 1},
    ]
    annotations = []
    aid = 1

    def add(img, cat):
        nonlocal aid
        annotations.append(
            {
                "id": aid,
                "image_id": img,
                "category_id": cat,
                "bbox": [4, 4, 20, 20],
                "area": 400,
                "segmentation": [[4, 4, 24, 4, 24, 24, 4, 24]],
            }
        )
        aid += 1

    for i in range(9):
        add(i, 1)
    for i in range(3):
        add(i, 2)
    add(9, 3)
    p = tmp_path / "lvis_train.json"
    p.write_text(json.dumps(
        {"images": images, "categories": categories, "annotations": annotations}
    ))
    return str(p)


def test_lvis_recipe_end_to_end(tmp_path):
    json_file = _lvis_json(tmp_path)
    name = "lvis_recipe_test_train"
    if name not in DatasetCatalog:
        register_lvis_instances(name, {}, json_file, str(tmp_path))

    dicts = load_lvis_json(json_file, str(tmp_path), name)
    assert len(dicts) == 10
    # lvis file names derive from coco_url
    assert dicts[0]["file_name"].endswith("0000.jpg")
    # category ids became contiguous 0-based
    cats = {a["category_id"] for d in dicts for a in d["annotations"]}
    assert cats == {0, 1, 2}

    # RepeatFactor: rare category (freq 0.1 < thresh 0.5) repeats sqrt(0.5/0.1)x
    rf = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(
        dicts, repeat_thresh=0.5
    )
    assert rf.shape == (10,)
    np.testing.assert_allclose(rf[9], np.sqrt(0.5 / 0.1), rtol=1e-6)
    # image 0 has freq (0.9) and comm (0.3): r = max over its categories
    np.testing.assert_allclose(rf[0], np.sqrt(0.5 / 0.3), rtol=1e-6)
    sampler = RepeatFactorTrainingSampler(rf, seed=0)
    it = iter(sampler)
    seen = [next(it) for _ in range(30)]
    assert 9 in seen  # the rare image is oversampled into the stream

    # federated-loss weights come from the registered metadata's image counts
    meta = MetadataCatalog.get(name)
    if not hasattr(meta, "class_image_count"):
        meta.set(class_image_count=[
            {"id": 1, "image_count": 9},
            {"id": 2, "image_count": 3},
            {"id": 3, "image_count": 1},
        ])
    w = get_fed_loss_cls_weights(name, 0.5)
    np.testing.assert_allclose(w, np.sqrt([9.0, 3.0, 1.0]), rtol=1e-6)
