"""LVIS evaluation (reference detectron2/evaluation/lvis_evaluation.py:22-380).

Runs on the numpy COCOeval core with LVIS parameters: max_dets 300, AP split
by category frequency bands (rare/common/frequent), and the LVIS protocol of
not capping detections per category. The lvis-api dependency of the reference
is replaced by the same json-backed dataset container used for COCO.
"""

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP, COCOStyleDataset
from detectron2_tpu.evaluation.coco_evaluation import instances_to_coco_json
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.modeling.postprocessing import detector_postprocess
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["LVISEvaluator"]


class LVISEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str, tasks=None, distributed: bool = True, output_dir=None, *, max_dets_per_image=None):
        self._distributed = distributed
        self._output_dir = output_dir
        self._max_dets_per_image = max_dets_per_image or 300
        self._metadata = MetadataCatalog.get(dataset_name)
        json_file = PathManager.get_local_path(self._metadata.json_file)
        self._lvis_api = COCOStyleDataset.from_json(json_file)
        self._tasks = tasks
        self._do_evaluation = len(self._lvis_api.getAnnIds()) > 0
        self._predictions = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        image_sizes = np.asarray(inputs["image_sizes"])
        out_np = {k: np.asarray(v) for k, v in outputs.items()}
        for i, meta in enumerate(inputs["metadata"]):
            in_h, in_w = int(image_sizes[i][0]), int(image_sizes[i][1])
            per_img = {k: v[i] for k, v in out_np.items()}
            instances = detector_postprocess(
                per_img, meta.get("height", in_h), meta.get("width", in_w), in_h, in_w
            )
            prediction = {"image_id": meta["image_id"]}
            prediction["instances"] = instances_to_coco_json(instances, meta["image_id"])
            self._predictions.append(prediction)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return
        else:
            predictions = self._predictions

        if len(predictions) == 0:
            logger.warning("[LVISEvaluator] Did not receive valid predictions.")
            return {}

        lvis_results = list(itertools.chain(*[x["instances"] for x in predictions]))
        tasks = self._tasks or ["bbox"] + (["segm"] if "segmentation" in lvis_results[0] else [])

        # LVIS annotations use 1-based contiguous ids already in most exports;
        # unmap if the dataset registered a contiguous mapping
        if hasattr(self._metadata, "thing_dataset_id_to_contiguous_id"):
            reverse_id_mapping = {
                v: k for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
            for result in lvis_results:
                result["category_id"] = reverse_id_mapping[result["category_id"]]
        else:
            for result in lvis_results:
                result["category_id"] += 1

        if self._output_dir:
            PathManager.mkdirs(self._output_dir)
            file_path = os.path.join(self._output_dir, "lvis_instances_results.json")
            with PathManager.open(file_path, "w") as f:
                json.dump(lvis_results, f)

        if not self._do_evaluation:
            logger.info("Annotations are not available for evaluation.")
            return {}

        self._results = OrderedDict()
        for task in sorted(tasks):
            res = self._eval_task(lvis_results, task)
            self._results[task] = res
        return copy.deepcopy(self._results)

    def _eval_task(self, lvis_results, iou_type):
        if iou_type == "segm":
            lvis_results = copy.deepcopy(lvis_results)
            for c in lvis_results:
                c.pop("bbox", None)

        lvis_dt = self._lvis_api.loadRes(lvis_results)
        lvis_eval = COCOevalNP(self._lvis_api, lvis_dt, iou_type)
        lvis_eval.params.maxDets = [self._max_dets_per_image] * 3
        lvis_eval.evaluate()
        lvis_eval.accumulate()
        lvis_eval.summarize()

        metrics = ["AP", "AP50", "AP75", "APs", "APm", "APl"]
        results = {
            m: float(lvis_eval.stats[i] * 100 if lvis_eval.stats[i] >= 0 else "nan")
            for i, m in enumerate(metrics)
        }

        # frequency-band APs (APr / APc / APf) from per-category precision
        freq_groups = {"r": [], "c": [], "f": []}
        cats = self._lvis_api.dataset.get("categories", [])
        cat_ids = [c["id"] for c in sorted(cats, key=lambda x: x["id"])]
        for idx, cat in enumerate(sorted(cats, key=lambda x: x["id"])):
            freq = cat.get("frequency", None)
            if freq in freq_groups:
                freq_groups[freq].append(idx)
        precisions = lvis_eval.eval["precision"]
        for band, idxs in freq_groups.items():
            if not idxs:
                continue
            p = precisions[:, :, idxs, 0, -1]
            p = p[p > -1]
            results[f"AP{band}"] = float(np.mean(p) * 100) if p.size else float("nan")

        logger.info(f"Evaluation results for {iou_type}: \n{results}")
        return results
