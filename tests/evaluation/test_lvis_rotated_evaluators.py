"""LVISEvaluator frequency-band APs and RotatedCOCOEvaluator analytic tests
(reference evaluation/lvis_evaluation.py, rotated_coco_evaluation.py)."""

import json

import numpy as np
import pytest

from detectron2_tpu.data.catalog import MetadataCatalog


def _lvis_gt_dataset():
    """3 categories tagged rare/common/frequent, one 20x20 gt of each per image."""
    images = [{"id": i, "width": 100, "height": 100, "file_name": f"{i}.jpg"} for i in range(2)]
    categories = [
        {"id": 1, "name": "rare_thing", "frequency": "r"},
        {"id": 2, "name": "common_thing", "frequency": "c"},
        {"id": 3, "name": "frequent_thing", "frequency": "f"},
    ]
    annotations = []
    aid = 1
    for i in range(2):
        for c in (1, 2, 3):
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": c,
                    "bbox": [5 + 25 * (c - 1), 10, 20, 20],
                    "area": 400,
                    "iscrowd": 0,
                }
            )
            aid += 1
    return {"images": images, "categories": categories, "annotations": annotations}


def _register_lvis(tmp_path, name):
    json_file = tmp_path / "lvis_gt.json"
    json_file.write_text(json.dumps(_lvis_gt_dataset()))
    MetadataCatalog.get(name).set(
        json_file=str(json_file),
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1, 3: 2},
    )


def test_lvis_evaluator_frequency_bands(tmp_path):
    """Perfect rare+frequent detections, missed common: APr=APf=100, APc=0."""
    from detectron2_tpu.evaluation.lvis_evaluation import LVISEvaluator

    name = "lvis_eval_test_bands"
    _register_lvis(tmp_path, name)
    ev = LVISEvaluator(name, distributed=False, output_dir=str(tmp_path))
    ev.reset()
    for i in range(2):
        inputs = {
            "metadata": [{"image_id": i, "height": 100, "width": 100}],
            "image_sizes": np.array([[100, 100]]),
        }
        # contiguous classes 0 (rare) and 2 (frequent) predicted exactly; 1 missed
        outputs = {
            "pred_boxes": np.array(
                [[[5, 10, 25, 30], [55, 10, 75, 30], [0, 0, 0, 0]]], np.float32
            ),
            "scores": np.array([[0.9, 0.8, 0.0]], np.float32),
            "pred_classes": np.array([[0, 2, 0]], np.int32),
            "valid": np.array([[True, True, False]]),
        }
        ev.process(inputs, outputs)
    res = ev.evaluate()["bbox"]
    assert res["APr"] == pytest.approx(100.0, abs=1e-4)
    assert res["APf"] == pytest.approx(100.0, abs=1e-4)
    assert res["APc"] == pytest.approx(0.0, abs=1e-4)
    assert res["AP"] == pytest.approx(100.0 * 2 / 3, abs=1e-3)
    assert (tmp_path / "lvis_instances_results.json").exists()


def test_lvis_evaluator_max_dets_not_capped_at_100(tmp_path):
    """The LVIS protocol evaluates 300 detections/image (not COCO's 100)."""
    from detectron2_tpu.evaluation.lvis_evaluation import LVISEvaluator

    name = "lvis_eval_test_maxdets"
    _register_lvis(tmp_path, name)
    ev = LVISEvaluator(name, distributed=False)
    assert ev._max_dets_per_image == 300
    ev.reset()
    # 150 junk boxes ranked above the one true detection: under maxDets=100
    # the true box would be cut off; at 300 it still counts.
    n_junk = 150
    boxes = [[0, 60, 4, 64]] * n_junk + [[5, 10, 25, 30]]
    scores = [0.99] * n_junk + [0.5]
    classes = [0] * n_junk + [0]
    pad = 160
    k = len(boxes)
    inputs = {
        "metadata": [{"image_id": 0, "height": 100, "width": 100}],
        "image_sizes": np.array([[100, 100]]),
    }
    outputs = {
        "pred_boxes": np.array([boxes + [[0, 0, 0, 0]] * (pad - k)], np.float32),
        "scores": np.array([scores + [0.0] * (pad - k)], np.float32),
        "pred_classes": np.array([classes + [0] * (pad - k)], np.int32),
        "valid": np.array([[True] * k + [False] * (pad - k)]),
    }
    ev.process(inputs, outputs)
    res = ev.evaluate()["bbox"]
    # rare gt in image 0 is recalled (precision poor but nonzero AP)
    assert res["APr"] > 0.0


def _rotated_gt_dataset():
    images = [{"id": 0, "width": 100, "height": 100, "file_name": "0.jpg"}]
    categories = [{"id": 1, "name": "thing"}]
    annotations = [
        {
            "id": 1,
            "image_id": 0,
            "category_id": 1,
            # (cx, cy, w, h, angle_deg)
            "bbox": [50, 50, 40, 10, 30],
            "area": 400,
            "iscrowd": 0,
        }
    ]
    return {"images": images, "categories": categories, "annotations": annotations}


def _make_rotated_evaluator(tmp_path, name):
    from detectron2_tpu.evaluation.rotated_coco_evaluation import RotatedCOCOEvaluator

    json_file = tmp_path / "rot_gt.json"
    json_file.write_text(json.dumps(_rotated_gt_dataset()))
    MetadataCatalog.get(name).set(
        json_file=str(json_file), thing_dataset_id_to_contiguous_id={1: 0}
    )
    return RotatedCOCOEvaluator(name, distributed=False, output_dir=str(tmp_path))


def _process_one(ev, box5, score=0.9):
    inputs = {
        "metadata": [{"image_id": 0, "height": 100, "width": 100}],
        "image_sizes": np.array([[100, 100]]),
    }
    outputs = {
        "pred_boxes": np.array([[box5, [0, 0, 0, 0, 0]]], np.float32),
        "scores": np.array([[score, 0.0]], np.float32),
        "pred_classes": np.array([[0, 0]], np.int32),
        "valid": np.array([[True, False]]),
    }
    ev.process(inputs, outputs)


def test_rotated_evaluator_perfect_match(tmp_path):
    ev = _make_rotated_evaluator(tmp_path, "rotated_eval_test_perfect")
    ev.reset()
    _process_one(ev, [50, 50, 40, 10, 30])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0, abs=1e-4)
    assert res["AP75"] == pytest.approx(100.0, abs=1e-4)


def test_rotated_evaluator_orthogonal_miss(tmp_path):
    """A thin box rotated 90 deg off the gt overlaps ~14% — below every COCO
    IoU threshold, so AP must be 0 (an axis-aligned metric would score the
    identical XYWH extents as a perfect match)."""
    ev = _make_rotated_evaluator(tmp_path, "rotated_eval_test_ortho")
    ev.reset()
    _process_one(ev, [50, 50, 40, 10, 120])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(0.0, abs=1e-4)


def test_rotated_evaluator_scales_to_original_frame(tmp_path):
    """Predictions in a 2x network frame rescale to the original image."""
    ev = _make_rotated_evaluator(tmp_path, "rotated_eval_test_scale")
    ev.reset()
    inputs = {
        "metadata": [{"image_id": 0, "height": 100, "width": 100}],
        "image_sizes": np.array([[200, 200]]),
    }
    outputs = {
        "pred_boxes": np.array([[[100, 100, 80, 20, 30]]], np.float32),
        "scores": np.array([[0.9]], np.float32),
        "pred_classes": np.array([[0]], np.int32),
        "valid": np.array([[True]]),
    }
    ev.process(inputs, outputs)
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0, abs=1e-3)
