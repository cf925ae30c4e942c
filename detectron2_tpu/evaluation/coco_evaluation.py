"""COCO-style AP evaluation (reference detectron2/evaluation/coco_evaluation.py:34-391).

Consumes the framework's padded batch/detections contract: ``process``
converts each image's padded device outputs to original-resolution host
Instances via detector_postprocess, then to COCO json dicts; ``evaluate``
gathers across host processes and runs the numpy COCOeval.
"""

import contextlib
import copy
import io
import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP, COCOStyleDataset
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.modeling.postprocessing import detector_postprocess
from detectron2_tpu.structures import BoxMode
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["COCOEvaluator", "instances_to_coco_json"]


def instances_to_coco_json(instances, img_id: int) -> List[dict]:
    """Host Instances -> COCO json detection dicts
    (reference coco_evaluation.py:392-450)."""
    num_instance = len(instances)
    if num_instance == 0:
        return []

    boxes = np.asarray(instances.pred_boxes.tensor, np.float64)
    boxes = BoxMode.convert(boxes, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    scores = np.asarray(instances.scores).tolist()
    classes = np.asarray(instances.pred_classes).tolist()

    has_mask = instances.has("pred_masks")
    rles = None
    if has_mask:
        from detectron2_tpu.evaluation.rle import mask_to_rle

        rles = [mask_to_rle(np.asarray(m)) for m in instances.pred_masks]
        for rle in rles:
            rle["counts"] = rle["counts"].decode("utf-8")

    has_keypoints = instances.has("pred_keypoints")

    results = []
    for k in range(num_instance):
        result = {
            "image_id": img_id,
            "category_id": int(classes[k]),
            "bbox": [float(x) for x in boxes[k]],
            "score": float(scores[k]),
        }
        if has_mask:
            result["segmentation"] = rles[k]
        if has_keypoints:
            kpts = np.asarray(instances.pred_keypoints)[k]
            # (x, y, logit, prob) slots -> COCO flat (x, y, v) with the -0.5
            # pixel-index convention (reference coco_evaluation.py:160-175)
            xy = kpts[:, :2] - 0.5
            v = kpts[:, -1:]
            result["keypoints"] = np.concatenate([xy, v], axis=1).reshape(-1).tolist()
        results.append(result)
    return results


class COCOEvaluator(DatasetEvaluator):
    """Evaluate box/segm/keypoint AP for instance detection/segmentation."""

    def __init__(
        self,
        dataset_name: str,
        tasks=None,
        distributed: bool = True,
        output_dir: Optional[str] = None,
        *,
        max_dets_per_image=None,
        kpt_oks_sigmas=(),
        allow_cached_coco: bool = True,
    ):
        self._logger = logging.getLogger(__name__)
        self._distributed = distributed
        self._output_dir = output_dir
        self._tasks = tasks
        self._max_dets_per_image = max_dets_per_image
        self._kpt_oks_sigmas = kpt_oks_sigmas

        self._metadata = MetadataCatalog.get(dataset_name)
        if not hasattr(self._metadata, "json_file"):
            # convert non-COCO datasets on the fly (reference :138-142)
            from detectron2_tpu.data.datasets.coco import convert_to_coco_json

            cache_path = os.path.join(output_dir or ".", f"{dataset_name}_coco_format.json")
            self._metadata.json_file = cache_path
            convert_to_coco_json(dataset_name, cache_path, allow_cached=allow_cached_coco)

        json_file = PathManager.get_local_path(self._metadata.json_file)
        self._coco_api = COCOStyleDataset.from_json(json_file)
        self._do_evaluation = "annotations" in self._coco_api.dataset
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def _tasks_from_predictions(self, predictions):
        tasks = {"bbox"}
        for pred in predictions:
            if "segmentation" in pred:
                tasks.add("segm")
            if "keypoints" in pred:
                tasks.add("keypoints")
        return sorted(tasks)

    def process(self, inputs, outputs):
        """
        Args:
            inputs: the batch dict (with "metadata" and "image_sizes").
            outputs: the model's padded detections dict for the batch.
        """
        metadata = inputs["metadata"]
        image_sizes = np.asarray(inputs["image_sizes"])
        out_np = {k: np.asarray(v) for k, v in outputs.items() if k != "metadata"}
        is_proposals = "proposal_boxes" in out_np and "pred_boxes" not in out_np
        for i, meta in enumerate(metadata):
            per_img = {k: v[i] for k, v in out_np.items()}
            in_h, in_w = int(image_sizes[i][0]), int(image_sizes[i][1])
            out_h = meta.get("height", in_h)
            out_w = meta.get("width", in_w)
            prediction = {"image_id": meta["image_id"]}
            if is_proposals:
                # ProposalNetwork output (reference coco_evaluation.py:172-173):
                # rescale padded proposals to the original frame, drop padding.
                valid = per_img["valid"].astype(bool)
                boxes = per_img["proposal_boxes"][valid].astype(np.float64)
                logits = per_img["proposal_logits"][valid].astype(np.float32)
                boxes = boxes * np.array([out_w / in_w, out_h / in_h] * 2)
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, out_w)
                boxes[:, 1::2] = boxes[:, 1::2].clip(0, out_h)
                prediction["proposals"] = {"boxes": boxes, "objectness_logits": logits}
            else:
                instances = detector_postprocess(per_img, out_h, out_w, in_h, in_w)
                prediction["instances"] = instances_to_coco_json(instances, meta["image_id"])
            if len(prediction) > 1:
                self._predictions.append(prediction)

    def evaluate(self, img_ids=None):
        if self._distributed:
            comm.synchronize()
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions

        if len(predictions) == 0:
            self._logger.warning("[COCOEvaluator] Did not receive valid predictions.")
            return {}

        if self._output_dir and "instances" in predictions[0]:
            PathManager.mkdirs(self._output_dir)
            file_path = os.path.join(self._output_dir, "instances_predictions.json")
            with PathManager.open(file_path, "w") as f:
                json.dump(predictions, f)

        self._results = OrderedDict()
        if "proposals" in predictions[0]:
            self._eval_box_proposals(predictions)
        if "instances" in predictions[0]:
            self._eval_predictions(predictions, img_ids=img_ids)
        return copy.deepcopy(self._results)

    def _eval_box_proposals(self, predictions):
        """AR@{100,1000} over area ranges for ProposalNetwork outputs
        (reference coco_evaluation.py:286-322)."""
        if self._output_dir:
            import pickle

            PathManager.mkdirs(self._output_dir)
            proposal_data = {
                "boxes": [p["proposals"]["boxes"] for p in predictions],
                "objectness_logits": [p["proposals"]["objectness_logits"] for p in predictions],
                "ids": [p["image_id"] for p in predictions],
                "bbox_mode": BoxMode.XYXY_ABS,
            }
            with PathManager.open(os.path.join(self._output_dir, "box_proposals.pkl"), "wb") as f:
                pickle.dump(proposal_data, f)

        if not self._do_evaluation:
            self._logger.info("Annotations are not available for evaluation.")
            return

        self._logger.info("Evaluating bbox proposals ...")
        res = {}
        areas = {"all": "", "small": "s", "medium": "m", "large": "l"}
        for limit in [100, 1000]:
            for area, suffix in areas.items():
                stats = _evaluate_box_proposals(predictions, self._coco_api, area=area, limit=limit)
                res["AR{}@{:d}".format(suffix, limit)] = float(stats["ar"] * 100)
        self._logger.info("Proposal metrics: " + str(res))
        self._results["box_proposals"] = res

    def _eval_predictions(self, predictions, img_ids=None):
        self._logger.info("Preparing results for COCO format ...")
        coco_results = list(itertools.chain(*[x["instances"] for x in predictions]))
        tasks = self._tasks or self._tasks_from_predictions(coco_results)

        # unmap the contiguous category ids to the dataset ids (reference :231-245)
        if hasattr(self._metadata, "thing_dataset_id_to_contiguous_id"):
            dataset_id_to_contiguous_id = self._metadata.thing_dataset_id_to_contiguous_id
            all_contiguous_ids = list(dataset_id_to_contiguous_id.values())
            num_classes = len(all_contiguous_ids)
            assert min(all_contiguous_ids) == 0 and max(all_contiguous_ids) == num_classes - 1

            reverse_id_mapping = {v: k for k, v in dataset_id_to_contiguous_id.items()}
            for result in coco_results:
                category_id = result["category_id"]
                assert category_id < num_classes, (
                    f"A prediction has class={category_id}, but the dataset only has {num_classes} classes."
                )
                result["category_id"] = reverse_id_mapping[category_id]

        if not self._do_evaluation:
            self._logger.info("Annotations are not available for evaluation.")
            return

        self._logger.info("Evaluating predictions with COCO API (numpy reimplementation)...")
        for task in sorted(tasks):
            coco_eval = (
                _evaluate_predictions_on_coco(
                    self._coco_api,
                    coco_results,
                    task,
                    kpt_oks_sigmas=self._kpt_oks_sigmas,
                    img_ids=img_ids,
                    max_dets_per_image=self._max_dets_per_image,
                )
                if len(coco_results) > 0
                else None
            )
            res = self._derive_coco_results(
                coco_eval, task, class_names=self._metadata.get("thing_classes")
            )
            self._results[task] = res

    def _derive_coco_results(self, coco_eval, iou_type, class_names=None):
        """Summary metrics + per-category AP (reference :530-590)."""
        metrics = {
            "bbox": ["AP", "AP50", "AP75", "APs", "APm", "APl"],
            "segm": ["AP", "AP50", "AP75", "APs", "APm", "APl"],
            "keypoints": ["AP", "AP50", "AP75", "APm", "APl"],
        }[iou_type]

        if coco_eval is None:
            self._logger.warning("No predictions from the model!")
            return {metric: float("nan") for metric in metrics}

        results = {
            metric: float(coco_eval.stats[idx] * 100 if coco_eval.stats[idx] >= 0 else "nan")
            for idx, metric in enumerate(metrics)
        }
        self._logger.info(f"Evaluation results for {iou_type}: \n" + str(results))
        if not np.isfinite(sum(results.values())):
            self._logger.info("Some metrics cannot be computed and is shown as NaN.")

        if class_names is None or len(class_names) <= 1:
            return results
        precisions = coco_eval.eval["precision"]
        assert len(class_names) == precisions.shape[2]

        results_per_category = []
        for idx, name in enumerate(class_names):
            precision = precisions[:, :, idx, 0, -1]
            precision = precision[precision > -1]
            ap = np.mean(precision) if precision.size else float("nan")
            results_per_category.append((f"{name}", float(ap * 100)))
        results.update({"AP-" + name: ap for name, ap in results_per_category})
        return results


def _pairwise_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix [len(a), len(b)] of XYXY boxes."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _evaluate_box_proposals(dataset_predictions, coco_api, thresholds=None, area="all", limit=None):
    """Proposal recall (AR) metrics — the reference's fast Detectron-style
    evaluation (coco_evaluation.py:456-560): greedily match each gt box to its
    best-covering unused proposal, then average recall over IoU 0.5:0.95.
    """
    areas = {
        "all": 0, "small": 1, "medium": 2, "large": 3,
        "96-128": 4, "128-256": 5, "256-512": 6, "512-inf": 7,
    }
    area_ranges = [
        [0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2],
        [96 ** 2, 128 ** 2], [128 ** 2, 256 ** 2], [256 ** 2, 512 ** 2], [512 ** 2, 1e5 ** 2],
    ]
    assert area in areas, f"Unknown area range: {area}"
    area_range = area_ranges[areas[area]]
    gt_overlaps = []
    num_pos = 0

    for prediction_dict in dataset_predictions:
        proposals = prediction_dict["proposals"]
        order = np.argsort(-np.asarray(proposals["objectness_logits"]))
        boxes = np.asarray(proposals["boxes"], np.float64)[order]

        anno = coco_api.loadAnns(coco_api.getAnnIds(imgIds=prediction_dict["image_id"]))
        gt_boxes = np.array(
            [
                BoxMode.convert(obj["bbox"], BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
                for obj in anno
                if obj.get("iscrowd", 0) == 0
            ],
            np.float64,
        ).reshape(-1, 4)
        gt_areas = np.array([obj["area"] for obj in anno if obj.get("iscrowd", 0) == 0])

        if len(gt_boxes) == 0 or len(boxes) == 0:
            continue
        keep_gt = (gt_areas >= area_range[0]) & (gt_areas <= area_range[1])
        gt_boxes = gt_boxes[keep_gt]
        num_pos += len(gt_boxes)
        if len(gt_boxes) == 0:
            continue
        if limit is not None and len(boxes) > limit:
            boxes = boxes[:limit]

        overlaps = _pairwise_iou_np(boxes, gt_boxes)
        _gt_overlaps = np.zeros(len(gt_boxes), np.float32)
        for j in range(min(len(boxes), len(gt_boxes))):
            max_overlaps = overlaps.max(axis=0)
            argmax_overlaps = overlaps.argmax(axis=0)
            gt_ind = max_overlaps.argmax()
            box_ind = argmax_overlaps[gt_ind]
            _gt_overlaps[j] = overlaps[box_ind, gt_ind]
            overlaps[box_ind, :] = -1
            overlaps[:, gt_ind] = -1
        gt_overlaps.append(_gt_overlaps)

    gt_overlaps = np.sort(np.concatenate(gt_overlaps)) if gt_overlaps else np.zeros(0, np.float32)
    if thresholds is None:
        thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05, dtype=np.float32)
    recalls = (
        np.array([(gt_overlaps >= t).sum() / float(num_pos) for t in thresholds])
        if num_pos > 0
        else np.full(len(thresholds), np.nan)
    )
    return {
        "ar": recalls.mean(),
        "recalls": recalls,
        "thresholds": thresholds,
        "gt_overlaps": gt_overlaps,
        "num_pos": num_pos,
    }


def _evaluate_predictions_on_coco(
    coco_gt: COCOStyleDataset,
    coco_results,
    iou_type,
    kpt_oks_sigmas=None,
    img_ids=None,
    max_dets_per_image=None,
):
    """Run COCOevalNP on the results (reference :600-660)."""
    assert len(coco_results) > 0

    if iou_type == "segm":
        coco_results = copy.deepcopy(coco_results)
        for c in coco_results:
            c.pop("bbox", None)

    coco_dt = coco_gt.loadRes(coco_results)
    coco_eval = COCOevalNP(coco_gt, coco_dt, iou_type)
    # keypoint eval keeps pycocotools' setKpParams maxDets=[20]
    # (reference :603-604 only overrides maxDets for bbox/segm)
    if max_dets_per_image is not None and iou_type != "keypoints":
        assert len(max_dets_per_image) >= 3
        coco_eval.params.maxDets = list(max_dets_per_image)
    if img_ids is not None:
        coco_eval.params.imgIds = img_ids
    if iou_type == "keypoints" and kpt_oks_sigmas:
        coco_eval.params.kpt_oks_sigmas = np.array(kpt_oks_sigmas)

    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    return coco_eval
