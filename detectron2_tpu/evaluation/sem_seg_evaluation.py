"""Semantic segmentation evaluation: mIoU / fwIoU / pACC via confusion matrix
(reference detectron2/evaluation/sem_seg_evaluation.py:36-200)."""

import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Optional

import numpy as np

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["SemSegEvaluator"]


class SemSegEvaluator(DatasetEvaluator):
    """Accumulate a (C+1)^2 confusion matrix over per-pixel predictions."""

    def __init__(self, dataset_name: str, distributed: bool = True, output_dir: Optional[str] = None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir

        meta = MetadataCatalog.get(dataset_name)
        self._num_classes = len(meta.stuff_classes)
        self._ignore_label = meta.get("ignore_label", 255)
        self._class_names = meta.stuff_classes
        self.input_file_to_gt_file = {
            dataset_record["file_name"]: dataset_record["sem_seg_file_name"]
            for dataset_record in DatasetCatalog.get(dataset_name)
        }
        self._conf_matrix = None

    def reset(self):
        self._conf_matrix = np.zeros((self._num_classes + 1, self._num_classes + 1), dtype=np.int64)

    def process(self, inputs, outputs):
        """outputs must contain "sem_seg": [B, H, W, C] logits in the network
        frame; gt is read from disk at original resolution."""
        from detectron2_tpu.data.detection_utils import read_image
        from detectron2_tpu.modeling.postprocessing import sem_seg_postprocess

        sem_seg = np.asarray(outputs["sem_seg"])
        image_sizes = np.asarray(inputs["image_sizes"])
        for i, meta in enumerate(inputs["metadata"]):
            h, w = meta["height"], meta["width"]
            logits = sem_seg_postprocess(sem_seg[i], image_sizes[i], h, w)
            pred = logits.argmax(axis=-1).astype(int)

            gt_file = self.input_file_to_gt_file[meta["file_name"]]
            gt = read_image(gt_file, "L").squeeze(-1).astype(int)

            gt[gt == self._ignore_label] = self._num_classes
            self._conf_matrix += np.bincount(
                (self._num_classes + 1) * pred.reshape(-1) + gt.reshape(-1),
                minlength=self._conf_matrix.size,
            ).reshape(self._conf_matrix.shape)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            conf_matrix_list = comm.all_gather(self._conf_matrix)
            if not comm.is_main_process():
                return
            self._conf_matrix = np.zeros_like(self._conf_matrix)
            for conf_matrix in conf_matrix_list:
                self._conf_matrix += conf_matrix

        acc = np.full(self._num_classes, np.nan, dtype=float)
        iou = np.full(self._num_classes, np.nan, dtype=float)
        tp = self._conf_matrix.diagonal()[:-1].astype(float)
        pos_gt = np.sum(self._conf_matrix[:-1, :-1], axis=0).astype(float)
        class_weights = pos_gt / np.maximum(np.sum(pos_gt), 1)
        pos_pred = np.sum(self._conf_matrix[:-1, :-1], axis=1).astype(float)
        acc_valid = pos_gt > 0
        acc[acc_valid] = tp[acc_valid] / pos_gt[acc_valid]
        iou_valid = (pos_gt + pos_pred) > 0
        union = pos_gt + pos_pred - tp
        iou[iou_valid] = tp[iou_valid] / union[iou_valid]
        macc = np.sum(acc[acc_valid]) / max(np.sum(acc_valid), 1)
        miou = np.sum(iou[iou_valid]) / max(np.sum(iou_valid), 1)
        fiou = np.sum(iou[iou_valid] * class_weights[iou_valid])
        pacc = np.sum(tp) / max(np.sum(pos_gt), 1)

        res = {"mIoU": 100 * miou, "fwIoU": 100 * fiou}
        for i, name in enumerate(self._class_names):
            res[f"IoU-{name}"] = 100 * iou[i]
        res["mACC"] = 100 * macc
        res["pACC"] = 100 * pacc
        for i, name in enumerate(self._class_names):
            res[f"ACC-{name}"] = 100 * acc[i]

        if self._output_dir:
            PathManager.mkdirs(self._output_dir)
            file_path = os.path.join(self._output_dir, "sem_seg_evaluation.json")
            with PathManager.open(file_path, "w") as f:
                json.dump(res, f)
        results = OrderedDict({"sem_seg": res})
        logger.info(results)
        return results
