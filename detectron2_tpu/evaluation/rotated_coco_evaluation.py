"""Rotated-box COCO evaluation (reference detectron2/evaluation/rotated_coco_evaluation.py:99-210):
COCO AP protocol with IoU computed by the rotated-box kernel."""

import itertools
import json
import logging
import os
from typing import List

import numpy as np

from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP
from detectron2_tpu.evaluation.coco_evaluation import COCOEvaluator
from detectron2_tpu.structures import BoxMode

logger = logging.getLogger(__name__)

__all__ = ["RotatedCOCOeval", "RotatedCOCOEvaluator"]


class RotatedCOCOeval(COCOevalNP):
    """COCOevalNP with rotated IoU for 5-dim boxes."""

    @staticmethod
    def is_rotated(box_list) -> bool:
        if isinstance(box_list, np.ndarray):
            return box_list.shape[-1] == 5
        if isinstance(box_list, list):
            if box_list == []:
                return False
            return np.all(np.array([(len(obj) == 5) and (isinstance(obj, list)) for obj in box_list]))
        return False

    @staticmethod
    def boxlist_to_tensor(boxlist, output_box_dim: int) -> np.ndarray:
        box_tensor = np.asarray(boxlist, dtype=np.float64).reshape(-1, len(boxlist[0]) if boxlist else 4)
        input_box_dim = box_tensor.shape[1]
        if input_box_dim != output_box_dim:
            if input_box_dim == 4 and output_box_dim == 5:
                box_tensor = BoxMode.convert(box_tensor, BoxMode.XYWH_ABS, BoxMode.XYWHA_ABS)
            else:
                raise Exception(f"Unable to convert from {input_box_dim}-dim box to {output_box_dim}-dim box")
        return box_tensor

    def compute_iou_dt_gt(self, dt, gt, is_crowd) -> np.ndarray:
        from detectron2_tpu.ops.rotated_boxes_ops import pairwise_iou_rotated

        if self.is_rotated(dt) or self.is_rotated(gt):
            assert all(c == 0 for c in is_crowd)
            dt_t = self.boxlist_to_tensor(dt, output_box_dim=5)
            gt_t = self.boxlist_to_tensor(gt, output_box_dim=5)
            return np.asarray(pairwise_iou_rotated(dt_t.astype(np.float32), gt_t.astype(np.float32)))
        # fallback: axis-aligned
        from detectron2_tpu.evaluation.coco_eval_np import _bbox_iou

        return _bbox_iou(np.asarray(dt, np.float64), np.asarray(gt, np.float64), is_crowd)

    def computeIoU(self, imgId, catId) -> np.ndarray:
        p = self.params
        gt = self._get_anns(self.cocoGt, imgId, catId)
        dt = self._get_anns(self.cocoDt, imgId, catId)
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        dt = sorted(dt, key=lambda x: -x.get("score", 0.0))[: p.maxDets[-1]]
        assert p.iouType == "bbox", "unsupported iouType for rotated measurement"
        g = [g_["bbox"] for g_ in gt]
        d = [d_["bbox"] for d_ in dt]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        return self.compute_iou_dt_gt(d, g, iscrowd)


class RotatedCOCOEvaluator(COCOEvaluator):
    """COCOEvaluator consuming rotated (cx, cy, w, h, a) predictions."""

    def process(self, inputs, outputs):
        from detectron2_tpu.structures import Instances, RotatedBoxes

        image_sizes = np.asarray(inputs["image_sizes"])
        out_np = {k: np.asarray(v) for k, v in outputs.items() if k != "metadata"}
        for i, meta in enumerate(inputs["metadata"]):
            valid = out_np["valid"][i].astype(bool)
            boxes = out_np["pred_boxes"][i][valid]  # [N, 5]
            in_h, in_w = int(image_sizes[i][0]), int(image_sizes[i][1])
            sx = meta.get("width", in_w) / in_w
            sy = meta.get("height", in_h) / in_h
            rb = RotatedBoxes(boxes.astype(np.float32))
            rb.scale(sx, sy)
            boxes = np.asarray(rb.tensor, np.float64)
            prediction = {"image_id": meta["image_id"], "instances": []}
            for k in range(len(boxes)):
                prediction["instances"].append(
                    {
                        "image_id": meta["image_id"],
                        "category_id": int(out_np["pred_classes"][i][valid][k]),
                        "bbox": boxes[k].tolist(),
                        "score": float(out_np["scores"][i][valid][k]),
                    }
                )
            self._predictions.append(prediction)

    def _eval_predictions(self, predictions, img_ids=None):
        logger.info("Preparing results for rotated COCO format ...")
        coco_results = list(itertools.chain(*[x["instances"] for x in predictions]))

        if hasattr(self._metadata, "thing_dataset_id_to_contiguous_id"):
            reverse_id_mapping = {
                v: k for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
            for result in coco_results:
                result["category_id"] = reverse_id_mapping[result["category_id"]]

        if self._output_dir:
            file_path = os.path.join(self._output_dir, "coco_instances_results.json")
            with open(file_path, "w") as f:
                json.dump(coco_results, f)

        if not self._do_evaluation:
            return
        coco_dt = self._coco_api.loadRes(coco_results)
        coco_eval = RotatedCOCOeval(self._coco_api, coco_dt, iouType="bbox")
        coco_eval.evaluate()
        coco_eval.accumulate()
        coco_eval.summarize()
        res = self._derive_coco_results(coco_eval, "bbox", class_names=self._metadata.get("thing_classes"))
        self._results["bbox"] = res
