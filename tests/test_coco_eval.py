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


# ---------------------------------------------------------------------------
# Box-proposal AR evaluation (reference coco_evaluation.py:456-560)
# ---------------------------------------------------------------------------


def test_box_proposals_analytic_ar():
    """One gt matched at IoU 1.0, one at 0.6 -> AR = (3*1 + 7*0.5)/10."""
    from detectron2_tpu.evaluation.coco_evaluation import _evaluate_box_proposals

    gt = make_gt(num_images=1, boxes_per_image=2)
    # gt boxes (XYXY): [10,10,30,30] and [40,10,60,30]
    # proposal 0: exact match of gt0 (IoU 1.0)
    # proposal 1: gt1 shifted right by 5 -> inter 15*20, union 25*20 -> IoU 0.6
    preds = [
        {
            "image_id": 0,
            "proposals": {
                "boxes": np.array([[10, 10, 30, 30], [45, 10, 65, 30]], np.float64),
                "objectness_logits": np.array([2.0, 1.0], np.float32),
            },
        }
    ]
    stats = _evaluate_box_proposals(preds, gt, area="all", limit=100)
    assert stats["num_pos"] == 2
    assert stats["ar"] == pytest.approx((3 * 1.0 + 7 * 0.5) / 10, abs=1e-6)


def test_box_proposals_greedy_assignment():
    """A single proposal covering two gts is consumed by the better one."""
    from detectron2_tpu.evaluation.coco_evaluation import _evaluate_box_proposals

    gt = make_gt(num_images=1, boxes_per_image=2)
    preds = [
        {
            "image_id": 0,
            "proposals": {
                # overlaps gt0 at IoU 1.0 and gt1 at some lower IoU; only one
                # gt may claim it, the other gets overlap 0 after removal
                "boxes": np.array([[10, 10, 30, 30]], np.float64),
                "objectness_logits": np.array([1.0], np.float32),
            },
        }
    ]
    stats = _evaluate_box_proposals(preds, gt, area="all", limit=100)
    # one gt recalled at every threshold, the other never
    assert stats["ar"] == pytest.approx(0.5, abs=1e-6)
    assert (stats["gt_overlaps"] == np.array([0.0, 1.0])).all()


def test_box_proposals_limit_and_sorting():
    """Low-scoring exact match beyond the limit must not count; sorting is by
    objectness, not input order."""
    from detectron2_tpu.evaluation.coco_evaluation import _evaluate_box_proposals

    gt = make_gt(num_images=1, boxes_per_image=1)
    junk = np.tile(np.array([[70.0, 70.0, 80.0, 80.0]]), (1, 1))
    boxes = np.concatenate([junk, np.array([[10.0, 10.0, 30.0, 30.0]])], axis=0)
    # exact match listed LAST but with the highest logit -> survives limit=1
    preds = [
        {
            "image_id": 0,
            "proposals": {
                "boxes": boxes,
                "objectness_logits": np.array([1.0, 5.0], np.float32),
            },
        }
    ]
    stats = _evaluate_box_proposals(preds, gt, area="all", limit=1)
    assert stats["ar"] == pytest.approx(1.0, abs=1e-6)
    # now give the junk the higher logit -> the match is cut by the limit
    preds[0]["proposals"]["objectness_logits"] = np.array([5.0, 1.0], np.float32)
    stats = _evaluate_box_proposals(preds, gt, area="all", limit=1)
    assert stats["ar"] == pytest.approx(0.0, abs=1e-6)


def test_coco_evaluator_proposals_e2e(tmp_path):
    """COCOEvaluator dispatches ProposalNetwork-style padded outputs to the
    AR path end to end (reference coco_evaluation.py:172-173,286-322)."""
    import json as _json

    from detectron2_tpu.data.catalog import MetadataCatalog
    from detectron2_tpu.evaluation.coco_evaluation import COCOEvaluator

    gt = make_gt(num_images=1, boxes_per_image=2)
    json_file = tmp_path / "gt.json"
    json_file.write_text(_json.dumps(gt.dataset))
    name = "proposal_eval_test_dataset"
    MetadataCatalog.get(name).set(json_file=str(json_file))

    ev = COCOEvaluator(name, distributed=False, output_dir=str(tmp_path))
    ev.reset()
    # network frame is 2x the original 100x100 image -> boxes scaled back down
    inputs = {
        "metadata": [{"image_id": 0, "height": 100, "width": 100}],
        "image_sizes": np.array([[200, 200]]),
    }
    outputs = {
        "proposal_boxes": np.array([[[20, 20, 60, 60], [80, 20, 120, 60], [0, 0, 0, 0]]], np.float32),
        "proposal_logits": np.array([[3.0, 2.0, -1.0]], np.float32),
        "valid": np.array([[True, True, False]]),
    }
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert "box_proposals" in res
    # both gts recalled exactly at IoU 1.0 at every threshold and every limit
    assert res["box_proposals"]["AR@100"] == pytest.approx(100.0, abs=1e-4)
    assert res["box_proposals"]["AR@1000"] == pytest.approx(100.0, abs=1e-4)
    # small-area range has no gts (area 400 >= 32^2? 400 < 1024 -> small)
    assert res["box_proposals"]["ARs@100"] == pytest.approx(100.0, abs=1e-4)
    assert (tmp_path / "box_proposals.pkl").exists()
