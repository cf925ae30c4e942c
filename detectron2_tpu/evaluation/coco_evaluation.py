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
        for i, meta in enumerate(metadata):
            per_img = {k: v[i] for k, v in out_np.items()}
            in_h, in_w = int(image_sizes[i][0]), int(image_sizes[i][1])
            instances = detector_postprocess(
                per_img, meta.get("height", in_h), meta.get("width", in_w), in_h, in_w
            )
            prediction = {"image_id": meta["image_id"]}
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

        if self._output_dir:
            PathManager.mkdirs(self._output_dir)
            file_path = os.path.join(self._output_dir, "instances_predictions.json")
            with PathManager.open(file_path, "w") as f:
                json.dump(predictions, f)

        self._results = OrderedDict()
        self._eval_predictions(predictions, img_ids=img_ids)
        return copy.deepcopy(self._results)

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
    if max_dets_per_image is not None:
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
