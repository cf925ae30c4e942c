"""Panoptic FPN (reference detectron2/modeling/meta_arch/panoptic_fpn.py:21-269):
GeneralizedRCNN + semantic segmentation head; the greedy panoptic fusion of
instance and semantic predictions runs on the host at postprocess time."""

from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.meta_arch.rcnn import GeneralizedRCNN
from detectron2_tpu.modeling.meta_arch.semantic_seg import build_sem_seg_head
from detectron2_tpu.modeling.proposal_generator import build_proposal_generator
from detectron2_tpu.modeling.roi_heads import build_roi_heads

__all__ = ["PanopticFPN", "combine_semantic_and_instance_outputs"]


@META_ARCH_REGISTRY.register()
class PanopticFPN(GeneralizedRCNN):
    """GeneralizedRCNN with an extra semseg branch."""

    sem_seg_head: nn.Module = None
    instance_loss_weight: float = 1.0
    combine_overlap_thresh: float = 0.5
    combine_stuff_area_thresh: int = 4096
    combine_instances_score_thresh: float = 0.5

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        return cls(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, backbone.output_shape()),
            roi_heads=build_roi_heads(cfg, backbone.output_shape()),
            sem_seg_head=build_sem_seg_head(cfg, backbone.output_shape()),
            instance_loss_weight=cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT,
            combine_overlap_thresh=cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH,
            combine_stuff_area_thresh=cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT,
            combine_instances_score_thresh=cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            input_format=cfg.INPUT.FORMAT,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        images = self.preprocess_image(batch["image"])
        image_sizes = batch["image_sizes"]
        features = self.backbone(images, train=train)

        sem_seg_logits, sem_seg_losses = self.sem_seg_head(
            features, targets=batch.get("gt_sem_seg"), train=train
        )

        gt_boxes = batch.get("gt_boxes")
        gt_valid = batch.get("gt_valid")
        (prop_boxes, prop_logits, prop_valid), proposal_losses = self.proposal_generator(
            features, image_sizes, gt_boxes=gt_boxes, gt_valid=gt_valid, train=train
        )

        targets = {k: batch[k] for k in batch if k.startswith("gt_")} if train else None
        detections, detector_losses = self.roi_heads(
            features, prop_boxes, prop_logits, prop_valid, image_sizes, targets=targets, train=train
        )

        if train:
            losses = dict(sem_seg_losses)
            losses.update({k: v * self.instance_loss_weight for k, v in detector_losses.items()})
            losses.update(proposal_losses)
            return losses

        detections["sem_seg"] = sem_seg_logits
        return detections


def combine_semantic_and_instance_outputs(
    instances,
    semantic_results: np.ndarray,
    overlap_threshold: float,
    stuff_area_thresh: float,
    instances_score_thresh: float,
):
    """Greedy panoptic fusion on the host (reference panoptic_fpn.py:184-269):
    paste instances in score order (skipping heavy overlap), then fill stuff
    regions above the area threshold.

    Args:
        instances: host Instances with pred_masks (full-res bool), scores,
            pred_classes.
        semantic_results: [H, W] semantic argmax labels.

    Returns:
        (panoptic_seg [H, W] int32 segment ids, segments_info list[dict])
    """
    panoptic_seg = np.zeros(semantic_results.shape, dtype=np.int32)

    sorted_inds = np.argsort(-np.asarray(instances.scores))
    current_segment_id = 0
    segments_info = []

    masks = np.asarray(instances.pred_masks.tensor).astype(bool)

    for inst_id in sorted_inds:
        score = float(instances.scores[inst_id])
        if score < instances_score_thresh:
            break
        mask = masks[inst_id]
        mask_area = mask.sum()
        if mask_area == 0:
            continue
        intersect = mask & (panoptic_seg > 0)
        intersect_area = intersect.sum()
        if intersect_area * 1.0 / mask_area > overlap_threshold:
            continue
        if intersect_area > 0:
            mask = mask & (panoptic_seg == 0)

        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": True,
                "score": score,
                "category_id": int(instances.pred_classes[inst_id]),
                "instance_id": int(inst_id),
            }
        )

    # add semantic results to remaining empty areas
    semantic_labels = np.unique(semantic_results)
    for semantic_label in semantic_labels:
        if semantic_label == 0:  # 0 is a special "thing" label
            continue
        mask = (semantic_results == semantic_label) & (panoptic_seg == 0)
        mask_area = mask.sum()
        if mask_area < stuff_area_thresh:
            continue
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": False,
                "category_id": int(semantic_label),
                "area": int(mask_area),
            }
        )

    return panoptic_seg, segments_info
