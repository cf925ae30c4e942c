"""COCOevalNP correctness tests against analytically known AP values."""

import numpy as np
import pytest

from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP, COCOStyleDataset


def make_gt(num_images=4, boxes_per_image=2):
    images = [{"id": i, "width": 100, "height": 100, "file_name": f"{i}.jpg"} for i in range(num_images)]
    categories = [{"id": 1, "name": "thing"}]
    annotations = []
    aid = 1
    for i in range(num_images):
        for b in range(boxes_per_image):
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [10 + 30 * b, 10, 20, 20],
                    "area": 400,
                    "iscrowd": 0,
                }
            )
            aid += 1
    return COCOStyleDataset(
        {"images": images, "categories": categories, "annotations": annotations}
    )


def run_eval(gt, results):
    dt = gt.loadRes(results)
    E = COCOevalNP(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E


def test_perfect_predictions():
    gt = make_gt()
    results = []
    for ann in gt.dataset["annotations"]:
        results.append(
            {
                "image_id": ann["image_id"],
                "category_id": 1,
                "bbox": list(ann["bbox"]),
                "score": 0.9,
            }
        )
    E = run_eval(gt, results)
    assert E.stats[0] == pytest.approx(1.0, abs=1e-6)  # AP
    assert E.stats[1] == pytest.approx(1.0, abs=1e-6)  # AP50
    assert E.stats[8] == pytest.approx(1.0, abs=1e-6)  # AR@100


def test_no_predictions_for_half_images():
    gt = make_gt(num_images=4)
    results = []
    for ann in gt.dataset["annotations"]:
        if ann["image_id"] < 2:
            results.append(
                {"image_id": ann["image_id"], "category_id": 1, "bbox": list(ann["bbox"]), "score": 0.9}
            )
    E = run_eval(gt, results)
    # recall = 0.5 at all thresholds; precision = 1.0 up to 50% recall
    assert E.stats[8] == pytest.approx(0.5, abs=1e-6)
    # 101-pt AP: precision 1 for recThrs <= 0.5 -> 51/101
    assert E.stats[0] == pytest.approx(51 / 101, abs=1e-6)


def test_false_positive_penalty():
    gt = make_gt(num_images=1, boxes_per_image=1)
    results = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [70, 70, 20, 20], "score": 0.95},  # FP with higher score
    ]
    E = run_eval(gt, results)
    # at every IoU: first det (highest score) is FP, second TP ->
    # precision at full recall = 0.5
    assert E.stats[0] == pytest.approx(0.5, abs=1e-6)


def test_localization_quality_affects_high_iou():
    gt = make_gt(num_images=1, boxes_per_image=1)
    # prediction offset by 5px: IoU = (15*20)/(2*400 - 300) = 300/500 = 0.6
    results = [{"image_id": 0, "category_id": 1, "bbox": [15, 10, 20, 20], "score": 0.9}]
    E = run_eval(gt, results)
    assert E.stats[1] == pytest.approx(1.0, abs=1e-6)  # AP50 matched
    assert E.stats[2] == pytest.approx(0.0, abs=1e-6)  # AP75 unmatched
    # matched at 0.5, 0.55, 0.6 -> 3/10 thresholds
    assert E.stats[0] == pytest.approx(0.3, abs=1e-6)


def test_crowd_not_penalized():
    images = [{"id": 0, "width": 100, "height": 100, "file_name": "0.jpg"}]
    categories = [{"id": 1, "name": "thing"}]
    annotations = [
        {"id": 1, "image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 0, "category_id": 1, "bbox": [50, 50, 40, 40], "area": 1600, "iscrowd": 1},
    ]
    gt = COCOStyleDataset({"images": images, "categories": categories, "annotations": annotations})
    results = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        # detection inside the crowd region: matched to crowd -> ignored, not FP
        {"image_id": 0, "category_id": 1, "bbox": [55, 55, 20, 20], "score": 0.8},
    ]
    E = run_eval(gt, results)
    assert E.stats[0] == pytest.approx(1.0, abs=1e-6)


def test_segm_iou_type():
    from detectron2_tpu.evaluation.rle import mask_to_rle

    images = [{"id": 0, "width": 50, "height": 50, "file_name": "0.jpg"}]
    categories = [{"id": 1, "name": "thing"}]
    m = np.zeros((50, 50), bool)
    m[10:30, 10:30] = True
    rle = mask_to_rle(m)
    rle["counts"] = rle["counts"].decode("utf-8")
    annotations = [
        {"id": 1, "image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400,
         "iscrowd": 0, "segmentation": rle}
    ]
    gt = COCOStyleDataset({"images": images, "categories": categories, "annotations": annotations})
    results = [{"image_id": 0, "category_id": 1, "segmentation": rle, "score": 0.9}]
    dt = gt.loadRes(results)
    E = COCOevalNP(gt, dt, "segm")
    E.evaluate()
    E.accumulate()
    E.summarize()
    assert E.stats[0] == pytest.approx(1.0, abs=1e-6)


def test_rle_roundtrip():
    from detectron2_tpu.evaluation.rle import decode_counts, encode_counts, mask_to_rle, rle_to_mask

    rng = np.random.RandomState(0)
    mask = rng.rand(37, 23) > 0.5
    rle = mask_to_rle(mask)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(mask, back)

    counts = [0, 5, 3, 100, 2, 17]
    np.testing.assert_array_equal(decode_counts(encode_counts(counts)), counts)
