"""Cascade R-CNN heads (reference detectron2/modeling/roi_heads/cascade_rcnn.py:32-299).

Fixed-shape cascade: K stages of (pool -> head -> predict -> refine boxes);
at training each stage rematches the refined boxes against GT with its own
IoU threshold (:209); at inference class scores are averaged over stages and
the last stage's boxes are used (:188-194). The reference's _ScaleGradient
(1/num_stages on head inputs, :20) is a custom gradient scale here.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.box_regression import Box2BoxTransform
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.poolers import ROIPooler
from detectron2_tpu.modeling.proposal_generator.proposal_utils import (
    add_ground_truth_to_proposals_padded,
)
from detectron2_tpu.modeling.roi_heads.box_head import build_box_head
from detectron2_tpu.modeling.roi_heads.fast_rcnn import (
    FastRCNNOutputLayers,
    fast_rcnn_inference_padded,
)
from detectron2_tpu.modeling.roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    StandardROIHeads,
    label_and_sample_proposals_padded,
)
from detectron2_tpu.structures.boxes import pairwise_iou

__all__ = ["CascadeROIHeads"]


@jax.custom_vjp
def _scale_gradient(x, scale):
    return x


def _scale_gradient_fwd(x, scale):
    return x, scale


def _scale_gradient_bwd(scale, g):
    return (g * scale, None)


_scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)


@ROI_HEADS_REGISTRY.register()
class CascadeROIHeads(StandardROIHeads):
    """StandardROIHeads with a multi-stage box cascade. box_head/box_predictor
    fields hold per-stage tuples."""

    cascade_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    cascade_bbox_reg_weights: Tuple[Tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        from detectron2_tpu.modeling.roi_heads.keypoint_head import build_keypoint_head
        from detectron2_tpu.modeling.roi_heads.mask_head import build_mask_head

        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        scales = tuple(1.0 / input_shape[f].stride for f in in_features)
        cascade_ious = tuple(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)
        cascade_weights = tuple(tuple(w) for w in cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS)
        num_stages = len(cascade_ious)
        assert len(cascade_weights) == num_stages
        assert not cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG is False or True

        box_heads = tuple(build_box_head(cfg) for _ in range(num_stages))
        predictors = []
        for k in range(num_stages):
            # cascade predictors are forced class-agnostic with per-stage
            # decode weights (reference cascade_rcnn.py:120-139)
            predictors.append(
                FastRCNNOutputLayers.from_config(cfg).clone(
                    cls_agnostic_bbox_reg=True, box2box_weights=cascade_weights[k]
                )
            )

        mask_head = build_mask_head(cfg) if cfg.MODEL.MASK_ON else None
        keypoint_head = build_keypoint_head(cfg) if cfg.MODEL.KEYPOINT_ON else None

        return cls(
            box_head=box_heads,
            box_predictor=tuple(predictors),
            in_features=in_features,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            matcher_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
            matcher_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pooler_scales=scales,
            pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
            mask_head=mask_head,
            mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            keypoint_head=keypoint_head,
            keypoint_pooler_resolution=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
            cascade_ious=cascade_ious,
            cascade_bbox_reg_weights=cascade_weights,
        )

    @property
    def num_cascade_stages(self) -> int:
        return len(self.cascade_ious)

    def _stage_transform(self, k: int) -> Box2BoxTransform:
        return Box2BoxTransform(weights=self.cascade_bbox_reg_weights[k])

    def _run_stage(self, feats, boxes, batch_idx, stage: int, train: bool):
        pooled = self._pooler(self.box_pooler_resolution)(feats, boxes, batch_idx)
        pooled = _scale_gradient(pooled, 1.0 / self.num_cascade_stages)
        box_feat = self.box_head[stage](pooled, train=train)
        return self.box_predictor[stage](box_feat, train=train)

    def _refine_boxes(self, stage: int, predictions, boxes_flat, image_sizes_flat):
        """Decode class-agnostic deltas and clip (stage k+1 proposals)."""
        _, deltas = predictions
        transform = self._stage_transform(stage)
        new_boxes = transform.apply_deltas(deltas[:, :4], boxes_flat)
        h = image_sizes_flat[:, 0].astype(new_boxes.dtype)
        w = image_sizes_flat[:, 1].astype(new_boxes.dtype)
        new_boxes = jnp.stack(
            [
                jnp.clip(new_boxes[:, 0], 0, w),
                jnp.clip(new_boxes[:, 1], 0, h),
                jnp.clip(new_boxes[:, 2], 0, w),
                jnp.clip(new_boxes[:, 3], 0, h),
            ],
            axis=-1,
        )
        return jax.lax.stop_gradient(new_boxes)

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposal_boxes: jnp.ndarray,
        proposal_logits: jnp.ndarray,
        proposal_valid: jnp.ndarray,
        image_sizes: jnp.ndarray,
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        B = proposal_boxes.shape[0]

        if train:
            assert targets is not None
            if self.proposal_append_gt:
                proposal_boxes, proposal_logits, proposal_valid = add_ground_truth_to_proposals_padded(
                    targets["gt_boxes"], targets["gt_valid"], proposal_boxes, proposal_logits, proposal_valid
                )
            rng = self.make_rng("sampling")
            losses = {}
            S = self.batch_size_per_image
            boxes = None
            sampled = None
            for k in range(self.num_cascade_stages):
                matcher = Matcher([self.cascade_ious[k]], [0, 1], allow_low_quality_matches=False)
                if k == 0:
                    sampled = label_and_sample_proposals_padded(
                        jax.random.fold_in(rng, k),
                        proposal_boxes,
                        proposal_valid,
                        targets,
                        matcher,
                        S,
                        self.positive_fraction,
                        self.num_classes,
                    )
                else:
                    # refined boxes from the previous stage become proposals;
                    # rematch with the stage's IoU, no re-sampling (reference :209)
                    sampled = self._rematch_only(
                        boxes.reshape(B, S, 4), sampled["valid"], targets, matcher
                    )

                boxes_flat = sampled["boxes"].reshape(-1, 4)
                batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
                predictions = self._run_stage(feats, boxes_flat, batch_idx, k, train=True)

                gt_boxes = jnp.take_along_axis(targets["gt_boxes"], sampled["gt_idx"][..., None], axis=1)
                predictor = self.box_predictor[k]
                stage_losses = predictor.losses(
                    predictions, boxes_flat, gt_boxes.reshape(-1, 4), sampled["gt_classes"].reshape(-1)
                )
                # override delta decoding weights for the box loss via stage transform:
                losses.update({f"{key}_stage{k}": v for key, v in stage_losses.items()})

                sizes_flat = jnp.repeat(image_sizes, S, axis=0)
                boxes = self._refine_boxes(k, predictions, boxes_flat, sizes_flat)

            if self.mask_head is not None:
                losses.update(self._forward_mask_train(feats, sampled, targets))
            if self.keypoint_head is not None:
                losses.update(self._forward_keypoint_train(feats, sampled, targets))
            return None, losses
        else:
            P = proposal_boxes.shape[1]
            boxes_flat = proposal_boxes.reshape(-1, 4)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
            sizes_flat = jnp.repeat(image_sizes, P, axis=0)

            scores_per_stage = []
            predictions = None
            for k in range(self.num_cascade_stages):
                if k > 0:
                    boxes_flat = self._refine_boxes(k - 1, predictions, boxes_flat, sizes_flat)
                predictions = self._run_stage(feats, boxes_flat, batch_idx, k, train=False)
                scores_per_stage.append(self.box_predictor[k].predict_probs(predictions))

            # average class probabilities over stages (reference :188-194)
            probs = sum(scores_per_stage) / self.num_cascade_stages
            last = self.box_predictor[-1]
            final_boxes = last.predict_boxes(predictions, boxes_flat).reshape(B, P, -1, 4)
            detections = fast_rcnn_inference_padded(
                final_boxes,
                probs.reshape(B, P, -1),
                proposal_valid,
                image_sizes,
                last.test_score_thresh,
                last.test_nms_thresh,
                last.test_topk_per_image,
            )
            detections = self.forward_with_given_boxes(features, detections)
            return detections, {}

    def _rematch_only(self, boxes, valid, targets, matcher):
        """Stages > 0: rematch the refined boxes against GT without
        re-sampling (reference cascade_rcnn.py:209-240 keeps all boxes)."""
        num_classes = self.num_classes

        def per_image(b, v, gt_b, gt_c, gt_v):
            iou = pairwise_iou(gt_b, b) * v[None, :]
            matched_idx, matched_labels = matcher(iou, gt_valid=gt_v)
            cls = jnp.where(matched_labels == 1, gt_c[matched_idx], num_classes)
            cls = jnp.where(v, cls, -1)
            return {
                "boxes": b,
                "gt_classes": cls,
                "gt_idx": matched_idx,
                "valid": v,
                "is_fg": (cls >= 0) & (cls < num_classes),
            }

        return jax.vmap(per_image)(
            boxes, valid, targets["gt_boxes"], targets["gt_classes"], targets["gt_valid"]
        )
