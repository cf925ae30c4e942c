"""Panoptic quality (PQ) evaluation
(reference detectron2/evaluation/panoptic_evaluation.py:24-199).

The reference shells out to panopticapi; here PQ is computed directly in
numpy (the standard PQ definition: per-category matched-IoU sums over TP with
FP/FN penalties).
"""

import contextlib
import io
import itertools
import json
import logging
import os
import tempfile
from collections import OrderedDict, defaultdict

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["COCOPanopticEvaluator", "pq_compute_single_image"]

OFFSET = 256 * 256 * 256
VOID = 0


def _rgb2id(color: np.ndarray) -> np.ndarray:
    """panopticapi id encoding."""
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def _id2rgb(id_map: np.ndarray) -> np.ndarray:
    out = np.zeros(id_map.shape + (3,), dtype=np.uint8)
    for i in range(3):
        out[..., i] = id_map % 256
        id_map = id_map // 256
    return out


def pq_compute_single_image(pan_gt: np.ndarray, pan_pred: np.ndarray, gt_segments, pred_segments, categories):
    """Accumulate per-category (iou, tp, fp, fn) for one image — the
    panopticapi pq_compute_single_core protocol."""
    stats = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})

    gt_segms = {el["id"]: el for el in gt_segments}
    pred_segms = {el["id"]: el for el in pred_segments}

    # predicted areas
    pred_labels, pred_areas = np.unique(pan_pred, return_counts=True)
    for label, area in zip(pred_labels, pred_areas):
        if label == VOID:
            continue
        if label in pred_segms:
            pred_segms[label]["area"] = int(area)
    gt_labels, gt_areas = np.unique(pan_gt, return_counts=True)
    for label, area in zip(gt_labels, gt_areas):
        if label in gt_segms:
            gt_segms[label]["area"] = int(area)

    # intersections
    pan_both = pan_gt.astype(np.int64) * OFFSET + pan_pred.astype(np.int64)
    labels, areas = np.unique(pan_both, return_counts=True)
    gt_pred_intersections = {}
    for label, area in zip(labels, areas):
        gt_id = label // OFFSET
        pred_id = label % OFFSET
        gt_pred_intersections[(gt_id, pred_id)] = int(area)

    matched_gt = set()
    matched_pred = set()
    for (gt_id, pred_id), inter in gt_pred_intersections.items():
        if gt_id not in gt_segms or pred_id not in pred_segms:
            continue
        gt_info = gt_segms[gt_id]
        pred_info = pred_segms[pred_id]
        if gt_info.get("iscrowd", 0) == 1:
            continue
        if gt_info["category_id"] != pred_info["category_id"]:
            continue
        union = (
            gt_info.get("area", 0)
            + pred_info.get("area", 0)
            - inter
            - gt_pred_intersections.get((VOID, pred_id), 0)
        )
        iou = inter / union if union > 0 else 0.0
        if iou > 0.5:
            cat = gt_info["category_id"]
            stats[cat]["tp"] += 1
            stats[cat]["iou"] += iou
            matched_gt.add(gt_id)
            matched_pred.add(pred_id)

    crowd_by_cat = {}
    for gt_id, gt_info in gt_segms.items():
        if gt_id in matched_gt:
            continue
        if gt_info.get("iscrowd", 0) == 1:
            crowd_by_cat[gt_info["category_id"]] = gt_id
            continue
        stats[gt_info["category_id"]]["fn"] += 1

    for pred_id, pred_info in pred_segms.items():
        if pred_id in matched_pred:
            continue
        inter_void = gt_pred_intersections.get((VOID, pred_id), 0)
        # crowd-region overlap also doesn't count as FP
        cat = pred_info["category_id"]
        if cat in crowd_by_cat:
            inter_void += gt_pred_intersections.get((crowd_by_cat[cat], pred_id), 0)
        if pred_info.get("area", 0) > 0 and inter_void / pred_info["area"] > 0.5:
            continue
        stats[cat]["fp"] += 1

    return stats


class COCOPanopticEvaluator(DatasetEvaluator):
    """Evaluate PQ on COCO-panoptic-format ground truth."""

    def __init__(self, dataset_name: str, output_dir=None):
        self._metadata = MetadataCatalog.get(dataset_name)
        self._thing_contiguous_id_to_dataset_id = {
            v: k for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
        }
        self._stuff_contiguous_id_to_dataset_id = {
            v: k for k, v in self._metadata.stuff_dataset_id_to_contiguous_id.items()
        }
        self._output_dir = output_dir
        self._predictions = []

    def reset(self):
        self._predictions = []

    def _convert_category_id(self, segment_info):
        isthing = segment_info.pop("isthing", None)
        if isthing is None:
            return segment_info
        if isthing:
            segment_info["category_id"] = self._thing_contiguous_id_to_dataset_id[
                segment_info["category_id"]
            ]
        else:
            segment_info["category_id"] = self._stuff_contiguous_id_to_dataset_id[
                segment_info["category_id"]
            ]
        return segment_info

    def process(self, inputs, outputs):
        """outputs: list of (panoptic_seg [H,W], segments_info) per image,
        already fused on the host (see PanopticFPN + combine...)."""
        for meta, (panoptic_img, segments_info) in zip(inputs["metadata"], outputs["panoptic_seg"]):
            segments_info = [self._convert_category_id(dict(x)) for x in segments_info]
            self._predictions.append(
                {
                    "image_id": meta["image_id"],
                    "panoptic_seg": np.asarray(panoptic_img),
                    "segments_info": segments_info,
                }
            )

    def evaluate(self):
        comm.synchronize()
        self._predictions = comm.gather(self._predictions)
        self._predictions = list(itertools.chain(*self._predictions))
        if not comm.is_main_process():
            return

        gt_json = PathManager.get_local_path(self._metadata.panoptic_json)
        gt_folder = PathManager.get_local_path(self._metadata.panoptic_root)
        with open(gt_json) as f:
            gt_data = json.load(f)
        gt_by_image = {a["image_id"]: a for a in gt_data["annotations"]}
        categories = {c["id"]: c for c in gt_data["categories"]}

        import cv2

        total = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
        for pred in self._predictions:
            gt_ann = gt_by_image.get(pred["image_id"])
            if gt_ann is None:
                continue
            gt_png = cv2.imread(os.path.join(gt_folder, gt_ann["file_name"]), cv2.IMREAD_COLOR)[
                :, :, ::-1
            ]
            pan_gt = _rgb2id(gt_png)
            stats = pq_compute_single_image(
                pan_gt, pred["panoptic_seg"], gt_ann["segments_info"], pred["segments_info"], categories
            )
            for cat, s in stats.items():
                for k in s:
                    total[cat][k] += s[k]

        def _pq_of(cats):
            pq, sq, rq, n = 0.0, 0.0, 0.0, 0
            for cat in cats:
                s = total.get(cat, None)
                if s is None or (s["tp"] + s["fp"] + s["fn"] == 0):
                    continue
                n += 1
                denom = s["tp"] + 0.5 * s["fp"] + 0.5 * s["fn"]
                pq += s["iou"] / denom if denom else 0.0
                sq += (s["iou"] / s["tp"]) if s["tp"] else 0.0
                rq += (s["tp"] / denom) if denom else 0.0
            n = max(n, 1)
            return 100 * pq / n, 100 * sq / n, 100 * rq / n

        all_cats = list(categories.keys())
        thing_cats = [c for c in all_cats if categories[c].get("isthing", 0) == 1]
        stuff_cats = [c for c in all_cats if categories[c].get("isthing", 0) == 0]

        res = {}
        res["PQ"], res["SQ"], res["RQ"] = _pq_of(all_cats)
        res["PQ_th"], res["SQ_th"], res["RQ_th"] = _pq_of(thing_cats)
        res["PQ_st"], res["SQ_st"], res["RQ_st"] = _pq_of(stuff_cats)

        results = OrderedDict({"panoptic_seg": res})
        logger.info(results)
        return results
