"""Cityscapes evaluators (reference detectron2/evaluation/cityscapes_evaluation.py:50,132).

The reference shells out to the external ``cityscapesscripts`` package (which
writes per-image prediction files to disk and re-reads them). That package is
not available here, so both evaluators are self-contained:

- ``CityscapesInstanceEvaluator``: converts Cityscapes instance ground truth
  and predictions into COCO-style records and scores AP / AP50 with the
  framework's own COCOeval reimplementation
  (:mod:`detectron2_tpu.evaluation.coco_eval_np`) over the mask IoU — the same
  matching rule cityscapesscripts implements.
- ``CityscapesSemSegEvaluator``: confusion-matrix IoU over the 19 trainId
  classes, like :class:`SemSegEvaluator` but reading Cityscapes ``labelIds``
  ground-truth PNGs and mapping id→trainId.
"""

import glob
import logging
import os
from collections import OrderedDict
from typing import Optional

import numpy as np

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["CityscapesInstanceEvaluator", "CityscapesSemSegEvaluator"]

# Cityscapes label id -> trainId for the 19 eval classes (everything else 255).
# Mirrors the public cityscapesscripts label table (labels with trainId<255).
CITYSCAPES_ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


class CityscapesEvaluator(DatasetEvaluator):
    """Shared base: resolves metadata and collects per-image predictions."""

    def __init__(self, dataset_name: str, output_dir: Optional[str] = None):
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._predictions = []

    def reset(self):
        self._predictions = []


class CityscapesInstanceEvaluator(CityscapesEvaluator):
    """Instance segmentation AP on Cityscapes.

    ``process`` takes the same padded-batch contract as COCOEvaluator:
    inputs carry ``metadata`` (with "annotations" from
    :func:`detectron2_tpu.data.datasets.cityscapes.load_cityscapes_instances`)
    and outputs carry padded ``pred_boxes/pred_classes/scores/pred_masks`` +
    ``valid``.
    """

    def reset(self):
        super().reset()
        self._gt_annotations = {}
        self._next_id = 1
        self._id_of = {}

    def process(self, inputs, outputs):
        from detectron2_tpu.evaluation.coco_evaluation import instances_to_coco_json
        from detectron2_tpu.modeling.postprocessing import detector_postprocess

        image_sizes = np.asarray(inputs["image_sizes"])
        out_np = {k: np.asarray(v) for k, v in outputs.items() if k != "metadata"}
        for i, meta in enumerate(inputs["metadata"]):
            key = meta.get("image_id", meta["file_name"])
            if key not in self._id_of:
                self._id_of[key] = self._next_id
                self._next_id += 1
            image_id = self._id_of[key]
            in_h, in_w = int(image_sizes[i][0]), int(image_sizes[i][1])
            instances = detector_postprocess(
                {k: v[i] for k, v in out_np.items()},
                meta.get("height", in_h),
                meta.get("width", in_w),
                in_h,
                in_w,
            )
            self._gt_annotations[image_id] = {
                "height": meta["height"],
                "width": meta["width"],
                "annotations": meta.get("annotations", []),
            }
            self._predictions.extend(instances_to_coco_json(instances, image_id))

    def evaluate(self):
        from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP, COCOStyleDataset

        thing_classes = list(self._metadata.thing_classes)
        images, annotations = [], []
        ann_id = 1
        for image_id, rec in self._gt_annotations.items():
            images.append({"id": image_id, "height": rec["height"], "width": rec["width"]})
            for ann in rec["annotations"]:
                a = dict(ann)
                a["id"] = ann_id
                a["image_id"] = image_id
                a.setdefault("iscrowd", 0)
                a.setdefault("area", a["bbox"][2] * a["bbox"][3])
                annotations.append(a)
                ann_id += 1
        gt = COCOStyleDataset(
            {
                "images": images,
                "annotations": annotations,
                "categories": [{"id": i, "name": n} for i, n in enumerate(thing_classes)],
            }
        )
        dt = gt.loadRes(self._predictions)
        ev = COCOevalNP(gt, dt, iouType="segm")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        ret = OrderedDict()
        # cityscapesscripts reports AP (0.5:0.95) and AP50, in percent
        ret["segm"] = {"AP": ev.stats[0] * 100, "AP50": ev.stats[1] * 100}
        return ret


class CityscapesSemSegEvaluator(CityscapesEvaluator):
    """Semantic segmentation IoU over the 19 Cityscapes train classes."""

    def reset(self):
        super().reset()
        n = 19
        self._conf_matrix = np.zeros((n + 1, n + 1), dtype=np.int64)

    def process(self, inputs, outputs):
        from detectron2_tpu.data.detection_utils import read_image
        from detectron2_tpu.modeling.postprocessing import sem_seg_postprocess

        sem_seg = np.asarray(outputs["sem_seg"])
        image_sizes = np.asarray(inputs["image_sizes"])
        n = 19
        for i, meta in enumerate(inputs["metadata"]):
            h, w = meta["height"], meta["width"]
            logits = sem_seg_postprocess(sem_seg[i], image_sizes[i], h, w)
            pred = logits.argmax(axis=-1).astype(np.int64)

            gt_file = meta.get("sem_seg_file_name")
            gt_ids = read_image(gt_file, "L").squeeze(-1).astype(np.int64)
            gt = np.full_like(gt_ids, n)
            for lid, tid in CITYSCAPES_ID_TO_TRAINID.items():
                gt[gt_ids == lid] = tid
            pred = np.clip(pred, 0, n)
            self._conf_matrix += np.bincount(
                (n + 1) * gt.reshape(-1) + pred.reshape(-1), minlength=(n + 1) ** 2
            ).reshape(n + 1, n + 1)

    def evaluate(self):
        n = 19
        cm = self._conf_matrix[:n, :n].astype(np.float64)  # drop ignore row/col
        tp = np.diag(cm)
        union = cm.sum(0) + cm.sum(1) - tp
        iou = np.where(union > 0, tp / np.maximum(union, 1), np.nan)
        ret = OrderedDict()
        ret["sem_seg"] = {"IoU": 100 * float(np.nanmean(iou))}
        return ret
