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
        self._predict_given = jax.jit(lambda p, b: self.model.apply(p, b, train=False))

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
        from detectron2_tpu.structures import Boxes, Instances

        orig_h, orig_w = input_dict["height"], input_dict["width"]
        augmented = self.tta_mapper(input_dict)
        tfms = [d.pop("transforms") for d in augmented]

        # 1. detect boxes on every augmented copy, invert transforms
        all_boxes, all_scores, all_classes = self._get_augmented_boxes(augmented, tfms)

        # 2. merge the union with the reference's fast_rcnn_inference protocol
        boxes, scores, classes = self._merge_detections(
            all_boxes, all_scores, all_classes, (orig_h, orig_w)
        )

        result = Instances((orig_h, orig_w))
        result.pred_boxes = Boxes(boxes.astype(np.float32))
        result.scores = scores.astype(np.float32)
        result.pred_classes = classes.astype(np.int64)

        # 3. re-run the mask head on the merged boxes in every augmented frame
        #    and average the probabilities (reference :222-236, :286-307)
        if self.cfg.MODEL.MASK_ON and len(boxes):
            masks = self._reduce_pred_masks(augmented, tfms, boxes, classes)
            # paste at the original resolution like detector_postprocess
            from detectron2_tpu.modeling.postprocessing import _paste_masks_np
            from detectron2_tpu.structures import BitMasks

            result.pred_masks = BitMasks(_paste_masks_np(masks, boxes, orig_h, orig_w))
        return {"instances": result}

    def _get_augmented_boxes(self, augmented: List[dict], tfms):
        all_boxes, all_scores, all_classes = [], [], []
        for aug_dict, tfm in zip(augmented, tfms):
            out = self._run_padded(aug_dict["image"])
            valid = out["valid"].astype(bool)
            boxes = out["pred_boxes"][valid]
            # invert the augmentation to original coordinates
            boxes = tfm.inverse().apply_box(boxes)
            all_boxes.append(boxes)
            all_scores.append(out["scores"][valid])
            all_classes.append(out["pred_classes"][valid])
        cat = lambda xs, d: np.concatenate(xs, axis=0) if xs else np.zeros(d)
        return (
            cat(all_boxes, (0, 4)),
            cat(all_scores, (0,)),
            cat(all_classes, (0,)).astype(np.int64),
        )

    def _merge_detections(self, all_boxes, all_scores, all_classes, shape_hw):
        """Reference :264-283: one-hot score rows through
        fast_rcnn_inference_single_image (score_thresh 1e-8, per-class NMS,
        DETECTIONS_PER_IMAGE cap), with boxes clipped to the original shape."""
        from detectron2_tpu.ops.nms import batched_nms

        h, w = shape_hw
        boxes = all_boxes.astype(np.float32).copy()
        if len(boxes) == 0:
            return boxes, all_scores.astype(np.float32), all_classes
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        keep_valid = (
            (boxes[:, 2] > boxes[:, 0])
            & (boxes[:, 3] > boxes[:, 1])
            & (all_scores > 1e-8)
            & np.isfinite(boxes).all(axis=1)
        )
        boxes, scores, classes = boxes[keep_valid], all_scores[keep_valid], all_classes[keep_valid]
        if len(boxes):
            keep = np.asarray(
                batched_nms(
                    boxes,
                    scores.astype(np.float32),
                    classes,
                    self.cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                )
            )
            keep = keep[: self.cfg.TEST.DETECTIONS_PER_IMAGE]
            boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
        return boxes, scores.astype(np.float32), classes

    def _reduce_pred_masks(self, augmented: List[dict], tfms, boxes, classes) -> np.ndarray:
        """Run the mask head on the merged boxes rescaled into each augmented
        frame; flip flipped copies back and average (reference :286-307).
        Returns [D, M, M] probabilities."""
        D = len(boxes)
        mask_sum = None
        for aug_dict, tfm in zip(augmented, tfms):
            aug_boxes = tfm.apply_box(boxes).astype(np.float32)
            image = aug_dict["image"].astype(np.float32)
            batch = self.collator([{"image": image}])
            batch.pop("metadata")
            Dp = max(D, 1)
            batch["given_boxes"] = jnp.asarray(aug_boxes.reshape(1, Dp, 4))
            batch["given_classes"] = jnp.asarray(classes.reshape(1, Dp).astype(np.int32))
            batch["given_valid"] = jnp.ones((1, Dp), bool)
            out = self._predict_given(self.params, batch)
            masks = np.asarray(out["pred_masks"], np.float32)[0]  # [D, M, M]
            if any(isinstance(t, T.HFlipTransform) for t in tfm.transforms):
                masks = masks[:, :, ::-1]
            mask_sum = masks if mask_sum is None else mask_sum + masks
        return mask_sum / len(augmented)
