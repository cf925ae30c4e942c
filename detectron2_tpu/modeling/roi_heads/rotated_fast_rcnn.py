"""Rotated Fast R-CNN heads (reference detectron2/modeling/roi_heads/rotated_fast_rcnn.py).

RROIHeads: StandardROIHeads over (cx, cy, w, h, a) boxes — rotated RoIAlign
pooling, rotated IoU matching, rotated NMS inference.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.box_regression import Box2BoxTransformRotated
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.proposal_generator.proposal_utils import (
    add_ground_truth_to_proposals_padded,
)
from detectron2_tpu.modeling.roi_heads.box_head import build_box_head
from detectron2_tpu.modeling.roi_heads.fast_rcnn import FastRCNNOutputLayers
from detectron2_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY, StandardROIHeads
from detectron2_tpu.modeling.sampling import subsample_labels_padded
from detectron2_tpu.ops.roi_align_rotated import roi_align_rotated_multilevel
from detectron2_tpu.ops.rotated_boxes_ops import nms_rotated_padded, pairwise_iou_rotated

__all__ = ["RROIHeads", "RotatedFastRCNNOutputLayers"]


class RotatedFastRCNNOutputLayers(FastRCNNOutputLayers):
    """FastRCNNOutputLayers with 5-dim rotated boxes and rotated NMS
    (reference rotated_fast_rcnn.py:135-168)."""

    box_dim: int = 5

    @classmethod
    def from_config(cls, cfg):
        # build through cls (FastRCNNOutputLayers.from_config instantiates
        # cls), then clone — flax modules have .clone, not .replace, and a
        # base-class instance would lose the rotated decode/NMS overrides
        base = FastRCNNOutputLayers.from_config.__func__(cls, cfg)
        weights = cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
        if len(weights) != 5:
            weights = (10.0, 10.0, 5.0, 5.0, 1.0)
        return base.clone(box_dim=5, box2box_weights=tuple(weights), cls_agnostic_bbox_reg=True)

    def predict_boxes(self, predictions, proposal_boxes):
        _, deltas = predictions
        transform = Box2BoxTransformRotated(weights=self.box2box_weights)
        R = deltas.shape[0]
        out = transform.apply_deltas(deltas, proposal_boxes)
        return out.reshape(R, -1, 5)

    def losses(self, predictions, proposal_boxes, gt_boxes, gt_classes):
        from detectron2_tpu.layers.losses import cross_entropy, smooth_l1_loss

        scores, deltas = predictions
        R = scores.shape[0]
        valid = gt_classes >= 0
        fg = valid & (gt_classes < self.num_classes)
        num_valid = jnp.maximum(valid.sum(), 1)
        loss_cls = cross_entropy(scores, jnp.where(valid, gt_classes, -100), reduction="sum", ignore_index=-100) / num_valid

        transform = Box2BoxTransformRotated(weights=self.box2box_weights)
        gt_deltas = transform.get_deltas(proposal_boxes, gt_boxes)
        reg = smooth_l1_loss(deltas[:, :5], jax.lax.stop_gradient(gt_deltas), beta=self.smooth_l1_beta).sum(-1)
        loss_box = (reg * fg).sum() / num_valid
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box}

    def inference(self, predictions, proposal_boxes, proposal_valid, image_sizes):
        """Rotated inference: per-class rotated NMS (reference rotated_fast_rcnn.py:46-134)."""
        scores, deltas = predictions
        B, P = proposal_boxes.shape[:2]
        boxes = self.predict_boxes((scores, deltas), proposal_boxes.reshape(-1, 5)).reshape(B, P, 5)
        probs = self.predict_probs((scores, deltas)).reshape(B, P, -1)
        C = probs.shape[-1] - 1
        topk = self.test_topk_per_image

        def per_image(b, s, v, hw):
            s = s[:, :C]
            keep = (s > self.test_score_thresh) & v[:, None]
            flat = jnp.where(keep, s, -jnp.inf).reshape(-1)
            cand = min(1024, flat.shape[0])
            top_s, top_idx = jax.lax.top_k(flat, cand)
            prop_idx = top_idx // C
            cls_idx = top_idx % C
            cand_boxes = b[prop_idx]
            cand_valid = jnp.isfinite(top_s)
            # per-class rotated NMS via the center-offset trick
            mx = jnp.max(jnp.where(cand_valid[:, None], cand_boxes[:, :2], 0.0))
            shifted = cand_boxes.at[:, 0].add(cls_idx.astype(cand_boxes.dtype) * (mx + 100.0))
            nms_keep = nms_rotated_padded(shifted, top_s, self.test_nms_thresh, valid=cand_valid)
            final = jnp.where(nms_keep, top_s, -jnp.inf)
            D = min(topk, cand)
            out_s, oi = jax.lax.top_k(final, D)
            out_valid = jnp.isfinite(out_s)
            return (
                cand_boxes[oi],
                jnp.where(out_valid, out_s, 0.0),
                cls_idx[oi],
                out_valid,
            )

        pb, ps, pc, pv = jax.vmap(per_image)(boxes, probs, proposal_valid, image_sizes)
        return {"pred_boxes": pb, "scores": ps, "pred_classes": pc, "valid": pv}


@ROI_HEADS_REGISTRY.register()
class RROIHeads(nn.Module):
    """Rotated-box StandardROIHeads (reference rotated_fast_rcnn.py:169-260)."""

    box_head: nn.Module
    box_predictor: nn.Module
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    num_classes: int = 80
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    matcher_thresholds: Tuple[float, ...] = (0.5,)
    matcher_labels: Tuple[int, ...] = (0, 1)
    proposal_append_gt: bool = True
    pooler_resolution: int = 7
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 0

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        scales = tuple(1.0 / input_shape[f].stride for f in in_features)
        return cls(
            box_head=build_box_head(cfg),
            box_predictor=RotatedFastRCNNOutputLayers.from_config(cfg),
            in_features=in_features,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            matcher_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
            matcher_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pooler_scales=scales,
            pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        )

    def _pool(self, feats, boxes_flat, batch_idx):
        return roi_align_rotated_multilevel(
            feats,
            boxes_flat,
            batch_idx,
            self.pooler_scales,
            self.pooler_resolution,
            sampling_ratio=self.pooler_sampling_ratio,
        )

    @nn.compact
    def __call__(
        self,
        features,
        proposal_boxes,  # [B, P, 5]
        proposal_logits,
        proposal_valid,
        image_sizes,
        targets=None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        B = proposal_boxes.shape[0]
        matcher = Matcher(list(self.matcher_thresholds), list(self.matcher_labels), allow_low_quality_matches=False)

        if train:
            assert targets is not None
            if self.proposal_append_gt:
                proposal_boxes, proposal_logits, proposal_valid = add_ground_truth_to_proposals_padded(
                    targets["gt_boxes"], targets["gt_valid"], proposal_boxes, proposal_logits, proposal_valid
                )
            rng = self.make_rng("sampling")
            S = self.batch_size_per_image
            C = self.num_classes

            def per_image(key, boxes, valid, gt_b, gt_c, gt_v):
                iou = pairwise_iou_rotated(gt_b, boxes) * valid[None, :]
                matched_idx, matched_labels = matcher(iou, gt_valid=gt_v)
                cls = jnp.where(matched_labels == 1, gt_c[matched_idx], C)
                samp = jnp.where(valid, (matched_labels == 1).astype(jnp.int32), -1)
                idx, sel_valid, is_fg = subsample_labels_padded(key, samp, S, self.positive_fraction, bg_label=0)
                return {
                    "boxes": boxes[idx],
                    "gt_classes": jnp.where(sel_valid, cls[idx], -1),
                    "gt_idx": matched_idx[idx],
                    "valid": sel_valid,
                }

            keys = jax.random.split(rng, B)
            sampled = jax.vmap(per_image)(
                keys, proposal_boxes, proposal_valid, targets["gt_boxes"], targets["gt_classes"], targets["gt_valid"]
            )
            S = self.batch_size_per_image
            boxes_flat = sampled["boxes"].reshape(-1, 5)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
            pooled = self._pool(feats, boxes_flat, batch_idx)
            box_feat = self.box_head(pooled, train=True)
            predictions = self.box_predictor(box_feat, train=True)
            gt_boxes = jnp.take_along_axis(targets["gt_boxes"], sampled["gt_idx"][..., None], axis=1)
            losses = self.box_predictor.losses(
                predictions, boxes_flat, gt_boxes.reshape(-1, 5), sampled["gt_classes"].reshape(-1)
            )
            return None, losses
        else:
            P = proposal_boxes.shape[1]
            boxes_flat = proposal_boxes.reshape(-1, 5)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
            pooled = self._pool(feats, boxes_flat, batch_idx)
            box_feat = self.box_head(pooled, train=False)
            predictions = self.box_predictor(box_feat, train=False)
            detections = self.box_predictor.inference(predictions, proposal_boxes, proposal_valid, image_sizes)
            return detections, {}
