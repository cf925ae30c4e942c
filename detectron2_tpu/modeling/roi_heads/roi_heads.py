"""ROI heads: second-stage per-region computation.

Parity with reference detectron2/modeling/roi_heads/roi_heads.py (ROIHeads
base :123-338, StandardROIHeads :529-877, Res5ROIHeads :341-526), re-designed
fixed-shape:

- ground truth arrives padded: a ``targets`` dict of
  {gt_boxes [B,G,4], gt_classes [B,G], gt_valid [B,G],
   gt_masks [B,G,Ms,Ms] (rasterized in each gt box's frame),
   gt_keypoints [B,G,K,3]}.
- ``label_and_sample_proposals`` (reference :219-302) becomes a vmapped
  match + randomized-topk subsample producing exactly
  ``batch_size_per_image`` slots per image.
- mask/keypoint branches run on a fixed foreground budget
  (= batch_size_per_image * positive_fraction slots, the sampler's positive
  cap) with validity masking.
- mask targets: the reference rasterizes polygons per sampled proposal on the
  host (masks.py:396); here per-GT fixed-size mask crops are resampled on
  device through the proposal-in-gt-box coordinate transform (standard TPU
  Mask R-CNN formulation).
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.poolers import ROIPooler
from detectron2_tpu.modeling.proposal_generator.proposal_utils import (
    add_ground_truth_to_proposals_padded,
)
from detectron2_tpu.modeling.roi_heads.box_head import build_box_head
from detectron2_tpu.modeling.roi_heads.fast_rcnn import FastRCNNOutputLayers
from detectron2_tpu.modeling.roi_heads.keypoint_head import (
    build_keypoint_head,
    keypoint_rcnn_inference,
    keypoint_rcnn_loss,
)
from detectron2_tpu.modeling.roi_heads.mask_head import (
    build_mask_head,
    mask_rcnn_inference,
    mask_rcnn_loss,
)
from detectron2_tpu.modeling.sampling import subsample_labels_padded
from detectron2_tpu.ops.roi_align import roi_align_separable
from detectron2_tpu.structures.boxes import pairwise_iou
from detectron2_tpu.utils.registry import Registry

ROI_HEADS_REGISTRY = Registry("ROI_HEADS")
"""Registry for ROI heads in a generalized R-CNN model."""

__all__ = [
    "ROI_HEADS_REGISTRY",
    "StandardROIHeads",
    "Res5ROIHeads",
    "build_roi_heads",
    "select_foreground_slots",
    "crop_gt_masks_to_proposals",
    "label_and_sample_proposals_padded",
]


def label_and_sample_proposals_padded(
    rng,
    proposal_boxes: jnp.ndarray,  # [B, P, 4]
    proposal_valid: jnp.ndarray,  # [B, P]
    targets: Dict[str, jnp.ndarray],
    matcher: Matcher,
    num_samples: int,
    positive_fraction: float,
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """vmapped match + subsample (reference roi_heads.py:219-302).

    Returns a dict of [B, S, ...] arrays: boxes, gt_classes (-1 on invalid
    slot, num_classes on background), gt_idx, valid, is_fg.
    """

    def per_image(key, boxes, valid, gt_boxes, gt_classes, gt_valid):
        iou = pairwise_iou(gt_boxes, boxes)  # [G, P]
        iou = iou * valid[None, :]
        matched_idx, matched_labels = matcher(iou, gt_valid=gt_valid)

        cls = jnp.where(matched_labels == 1, gt_classes[matched_idx], num_classes)
        samp_labels = jnp.where(valid, (matched_labels == 1).astype(jnp.int32), -1)
        samp_labels = jnp.where(matched_labels == -1, -1, samp_labels)

        idx, sel_valid, is_fg = subsample_labels_padded(
            key, samp_labels, num_samples, positive_fraction, bg_label=0
        )
        out_cls = jnp.where(sel_valid, cls[idx], -1)
        return {
            "boxes": boxes[idx],
            "gt_classes": out_cls,
            "gt_idx": matched_idx[idx],
            "valid": sel_valid,
            "is_fg": is_fg & (out_cls >= 0) & (out_cls < num_classes),
        }

    B = proposal_boxes.shape[0]
    keys = jax.random.split(rng, B)
    return jax.vmap(per_image)(
        keys,
        proposal_boxes,
        proposal_valid,
        targets["gt_boxes"],
        targets["gt_classes"],
        targets["gt_valid"],
    )


def build_roi_heads(cfg, input_shape):
    """Build ROIHeads from `cfg.MODEL.ROI_HEADS.NAME`."""
    name = cfg.MODEL.ROI_HEADS.NAME
    return ROI_HEADS_REGISTRY.get(name).from_config(cfg, input_shape)


def select_foreground_slots(is_fg: jnp.ndarray, budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick (up to) ``budget`` foreground slots out of a sampled batch,
    preserving order — the fixed-shape analogue of
    ``select_foreground_proposals`` (reference roi_heads.py:46).

    Returns (indices [budget], valid [budget]).
    """
    S = is_fg.shape[0]
    priority = is_fg.astype(jnp.float32) * 2.0 - jnp.arange(S, dtype=jnp.float32) / S
    _, idx = jax.lax.top_k(priority, budget)
    return idx.astype(jnp.int32), is_fg[idx]


def crop_gt_masks_to_proposals(
    gt_masks: jnp.ndarray,  # [G, Ms, Ms] per-gt mask rasterized inside its gt box
    gt_boxes: jnp.ndarray,  # [G, 4]
    matched_gt_idx: jnp.ndarray,  # [R]
    proposal_boxes: jnp.ndarray,  # [R, 4]
    mask_size: int,
) -> jnp.ndarray:
    """Produce [R, mask_size, mask_size] {0,1} targets: each proposal's crop
    of its matched gt's mask, via RoIAlign on the fixed-size gt-frame mask
    with the proposal box mapped into that frame."""
    Ms = gt_masks.shape[1]
    g_boxes = gt_boxes[matched_gt_idx]  # [R, 4]
    gx0, gy0, gx1, gy1 = g_boxes[:, 0], g_boxes[:, 1], g_boxes[:, 2], g_boxes[:, 3]
    gw = jnp.maximum(gx1 - gx0, 1e-4)
    gh = jnp.maximum(gy1 - gy0, 1e-4)
    # proposal box in gt-mask pixel coordinates
    px0 = (proposal_boxes[:, 0] - gx0) / gw * Ms
    py0 = (proposal_boxes[:, 1] - gy0) / gh * Ms
    px1 = (proposal_boxes[:, 2] - gx0) / gw * Ms
    py1 = (proposal_boxes[:, 3] - gy0) / gh * Ms
    boxes_in_mask = jnp.stack([px0, py0, px1, py1], axis=-1)

    # separable-matmul RoIAlign: the gather formulation on [G, Ms, Ms, 1]
    # cost ~26% of the whole train step (profile_breakdown, v5e batch 8)
    crops = roi_align_separable(
        gt_masks,
        boxes_in_mask,
        matched_gt_idx,
        output_size=(mask_size, mask_size),
        sampling_ratio=2,
        aligned=True,
    )
    return (crops >= 0.5).astype(jnp.float32)


@ROI_HEADS_REGISTRY.register()
class StandardROIHeads(nn.Module):
    """Separate pooler + head per task (box / mask / keypoint), the FPN
    standard (reference roi_heads.py:529)."""

    box_head: nn.Module
    box_predictor: nn.Module
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    num_classes: int = 80
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    matcher_thresholds: Tuple[float, ...] = (0.5,)
    matcher_labels: Tuple[int, ...] = (0, 1)
    proposal_append_gt: bool = True
    # poolers (plain config; ROIPooler is stateless)
    box_pooler_resolution: int = 7
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 0
    pooler_type: str = "ROIAlignV2"
    # mask branch
    mask_head: Optional[nn.Module] = None
    mask_pooler_resolution: int = 14
    # keypoint branch
    keypoint_head: Optional[nn.Module] = None
    keypoint_pooler_resolution: int = 14
    normalize_kpt_loss_by_visible: bool = True
    keypoint_loss_weight: float = 1.0
    train_on_pred_boxes: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        scales = tuple(1.0 / input_shape[f].stride for f in in_features)
        mask_head = build_mask_head(cfg) if cfg.MODEL.MASK_ON else None
        keypoint_head = build_keypoint_head(cfg) if cfg.MODEL.KEYPOINT_ON else None
        return cls(
            box_head=build_box_head(cfg),
            box_predictor=FastRCNNOutputLayers.from_config(cfg),
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
            normalize_kpt_loss_by_visible=cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS,
            keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
            train_on_pred_boxes=cfg.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES,
        )

    @property
    def fg_budget(self) -> int:
        return max(1, int(self.batch_size_per_image * self.positive_fraction))

    def _pooler(self, resolution: int) -> ROIPooler:
        return ROIPooler(
            output_size=resolution,
            scales=self.pooler_scales,
            sampling_ratio=self.pooler_sampling_ratio,
            pooler_type=self.pooler_type,
        )

    def _matcher(self) -> Matcher:
        return Matcher(list(self.matcher_thresholds), list(self.matcher_labels), allow_low_quality_matches=False)

    # ------------------------------------------------------------- sampling
    def label_and_sample_proposals(self, rng, proposal_boxes, proposal_valid, targets):
        return label_and_sample_proposals_padded(
            rng,
            proposal_boxes,
            proposal_valid,
            targets,
            self._matcher(),
            self.batch_size_per_image,
            self.positive_fraction,
            self.num_classes,
        )

    # -------------------------------------------------------------- forward
    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposal_boxes: jnp.ndarray,  # [B, P, 4]
        proposal_logits: jnp.ndarray,  # [B, P]
        proposal_valid: jnp.ndarray,  # [B, P]
        image_sizes: jnp.ndarray,  # [B, 2]
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
            sampled = self.label_and_sample_proposals(rng, proposal_boxes, proposal_valid, targets)
            losses = self._forward_box_train(feats, sampled, targets)
            if self._has_mask_branch():
                losses.update(self._forward_mask_train(feats, sampled, targets))
            if self.keypoint_head is not None:
                losses.update(self._forward_keypoint_train(feats, sampled, targets))
            return None, losses
        else:
            detections = self._forward_box_inference(
                feats, proposal_boxes, proposal_valid, image_sizes
            )
            detections = self.forward_with_given_boxes(features, detections)
            return detections, {}

    def forward_with_given_boxes(self, features, detections):
        """Run mask/keypoint heads on final detection boxes (inference
        cascade: box first; reference roi_heads.py:753)."""
        feats = [features[f] for f in self.in_features]
        if self._has_mask_branch():
            detections = self._forward_mask_inference(feats, detections)
        if self.keypoint_head is not None:
            detections = self._forward_keypoint_inference(feats, detections)
        return detections

    def _has_mask_branch(self) -> bool:
        """Whether the mask-branch hooks run (subclasses with extra per-roi
        dense branches — e.g. DensePose — override to opt in without masks)."""
        return self.mask_head is not None

    # ------------------------------------------------------------ box branch
    def _box_features(self, feats, boxes_flat, batch_idx, train):
        pooled = self._pooler(self.box_pooler_resolution)(feats, boxes_flat, batch_idx)
        return self.box_head(pooled, train=train)

    def _forward_box_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        boxes_flat = sampled["boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        box_feat = self._box_features(feats, boxes_flat, batch_idx, train=True)
        predictions = self.box_predictor(box_feat, train=True)

        # matched gt box per sampled proposal
        gt_boxes = jnp.take_along_axis(targets["gt_boxes"], sampled["gt_idx"][..., None], axis=1)
        gt_classes = sampled["gt_classes"].reshape(-1)
        # background / invalid slots contribute no box loss; class loss uses -1 padding
        losses = self.box_predictor.losses(
            predictions,
            boxes_flat,
            gt_boxes.reshape(-1, 4),
            gt_classes,
        )
        return losses

    def _forward_box_inference(self, feats, proposal_boxes, proposal_valid, image_sizes):
        B, P = proposal_boxes.shape[:2]
        boxes_flat = proposal_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
        box_feat = self._box_features(feats, boxes_flat, batch_idx, train=False)
        predictions = self.box_predictor(box_feat, train=False)
        return self.box_predictor.inference(predictions, proposal_boxes, proposal_valid, image_sizes)

    # ----------------------------------------------------------- mask branch
    def _forward_mask_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        def pick(is_fg_i):
            return select_foreground_slots(is_fg_i, Rf)

        fg_idx, fg_valid = jax.vmap(pick)(sampled["is_fg"])  # [B, Rf]
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)  # [B,Rf,4]
        fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        pooled = self._pooler(self.mask_pooler_resolution)(feats, boxes_flat, batch_idx)
        mask_logits = self.mask_head(pooled, train=True)  # [B*Rf, M, M, C]
        M = mask_logits.shape[1]

        def targets_per_image(gt_masks_i, gt_boxes_i, gt_idx_i, boxes_i):
            return crop_gt_masks_to_proposals(gt_masks_i, gt_boxes_i, gt_idx_i, boxes_i, M)

        gt_targets = jax.vmap(targets_per_image)(
            targets["gt_masks"], targets["gt_boxes"], fg_gt_idx, fg_boxes
        )  # [B, Rf, M, M]

        loss = mask_rcnn_loss(
            mask_logits,
            fg_cls.reshape(-1),
            gt_targets.reshape(-1, M, M),
            fg_valid.reshape(-1),
        )
        return {"loss_mask": loss}

    def _forward_mask_inference(self, feats, detections):
        B, D = detections["pred_classes"].shape
        boxes_flat = detections["pred_boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
        pooled = self._pooler(self.mask_pooler_resolution)(feats, boxes_flat, batch_idx)
        mask_logits = self.mask_head(pooled, train=False)
        probs = mask_rcnn_inference(mask_logits, detections["pred_classes"].reshape(-1))
        M = probs.shape[-1]
        detections["pred_masks"] = probs.reshape(B, D, M, M)
        return detections

    # ------------------------------------------------------- keypoint branch
    def _forward_keypoint_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        pooled = self._pooler(self.keypoint_pooler_resolution)(feats, boxes_flat, batch_idx)
        kpt_logits = self.keypoint_head(pooled, train=True)  # [B*Rf, S', S', K]

        gt_kpts = jnp.take_along_axis(
            targets["gt_keypoints"], fg_gt_idx[..., None, None], axis=1
        )  # [B, Rf, K, 3]

        normalizer = None
        if not self.normalize_kpt_loss_by_visible:
            normalizer = float(B * self.batch_size_per_image * self.positive_fraction)
        loss = keypoint_rcnn_loss(
            kpt_logits,
            boxes_flat,
            gt_kpts.reshape(-1, *gt_kpts.shape[2:]),
            fg_valid.reshape(-1),
            normalizer=normalizer,
        )
        return {"loss_keypoint": loss * self.keypoint_loss_weight}

    def _forward_keypoint_inference(self, feats, detections):
        B, D = detections["pred_classes"].shape
        boxes_flat = detections["pred_boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
        pooled = self._pooler(self.keypoint_pooler_resolution)(feats, boxes_flat, batch_idx)
        kpt_logits = self.keypoint_head(pooled, train=False)
        kpts = keypoint_rcnn_inference(kpt_logits, boxes_flat)  # [B*D, K, 4]
        detections["pred_keypoints"] = kpts.reshape(B, D, *kpts.shape[1:])
        return detections

    def keypoint_logits(self, features, boxes_flat, batch_idx):
        """Raw keypoint-head heatmap logits [R, S', S', K] for the given boxes
        — the pre-decode surface for parity testing / export debugging."""
        feats = [features[f] for f in self.in_features]
        pooled = self._pooler(self.keypoint_pooler_resolution)(feats, boxes_flat, batch_idx)
        return self.keypoint_head(pooled, train=False)


@ROI_HEADS_REGISTRY.register()
class Res5ROIHeads(nn.Module):
    """The C4 heads: a single pooler on res4 + the shared res5 stage as the
    box (and mask) feature extractor (reference roi_heads.py:341-526)."""

    res5: Tuple  # tuple of block modules forming the res5 stage
    box_predictor: nn.Module
    mask_head: Optional[nn.Module] = None
    in_features: Tuple[str, ...] = ("res4",)
    num_classes: int = 80
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    matcher_thresholds: Tuple[float, ...] = (0.5,)
    matcher_labels: Tuple[int, ...] = (0, 1)
    proposal_append_gt: bool = True
    pooler_resolution: int = 14
    pooler_scales: Tuple[float, ...] = (1.0 / 16,)
    pooler_sampling_ratio: int = 0
    pooler_type: str = "ROIAlignV2"

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        from detectron2_tpu.modeling.backbone.resnet import BottleneckBlock

        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        scales = tuple(1.0 / input_shape[f].stride for f in in_features)
        # the reference's C4 head ALWAYS builds 3 bottleneck blocks for its
        # res5 stage, even for BasicBlock depths like R18
        # (reference roi_heads.py:_build_res5_block: stage_channel_factor=8)
        num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
        bottleneck_channels = num_groups * cfg.MODEL.RESNETS.WIDTH_PER_GROUP * 8
        out_channels = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8
        blocks = [
            BottleneckBlock(
                name=f"res5_{b}",
                in_channels=out_channels // 2 if b == 0 else out_channels,
                out_channels=out_channels,
                bottleneck_channels=bottleneck_channels,
                stride=2 if b == 0 else 1,
                num_groups=num_groups,
                stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
                norm=cfg.MODEL.RESNETS.NORM,
            )
            for b in range(3)
        ]
        mask_head = build_mask_head(cfg) if cfg.MODEL.MASK_ON else None
        predictor = FastRCNNOutputLayers.from_config(cfg)
        return cls(
            res5=tuple(blocks),
            box_predictor=predictor,
            mask_head=mask_head,
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
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
        )

    @property
    def fg_budget(self) -> int:
        return max(1, int(self.batch_size_per_image * self.positive_fraction))

    def _shared_roi_transform(self, feats, boxes_flat, batch_idx, train):
        pooler = ROIPooler(
            output_size=self.pooler_resolution,
            scales=self.pooler_scales,
            sampling_ratio=self.pooler_sampling_ratio,
            pooler_type=self.pooler_type,
        )
        x = pooler(feats, boxes_flat, batch_idx)
        for block in self.res5:
            x = block(x, train=train)
        return x  # [R, res/2, res/2, 2048]

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
            matcher = Matcher(
                list(self.matcher_thresholds), list(self.matcher_labels), allow_low_quality_matches=False
            )
            sampled = label_and_sample_proposals_padded(
                rng,
                proposal_boxes,
                proposal_valid,
                targets,
                matcher,
                self.batch_size_per_image,
                self.positive_fraction,
                self.num_classes,
            )
            S = self.batch_size_per_image
            boxes_flat = sampled["boxes"].reshape(-1, 4)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
            x = self._shared_roi_transform(feats, boxes_flat, batch_idx, train=True)
            box_feat = x.mean(axis=(1, 2))
            predictions = self.box_predictor(box_feat, train=True)
            gt_boxes = jnp.take_along_axis(targets["gt_boxes"], sampled["gt_idx"][..., None], axis=1)
            losses = self.box_predictor.losses(
                predictions, boxes_flat, gt_boxes.reshape(-1, 4), sampled["gt_classes"].reshape(-1)
            )
            if self.mask_head is not None:
                Rf = self.fg_budget
                fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
                flat_fg = (fg_idx + jnp.arange(B, dtype=jnp.int32)[:, None] * S).reshape(-1)
                mask_feat = x[flat_fg]
                mask_logits = self.mask_head(mask_feat, train=True)
                M = mask_logits.shape[1]
                fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
                fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
                fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)
                gt_targets = jax.vmap(
                    lambda m, bx, gi, pb: crop_gt_masks_to_proposals(m, bx, gi, pb, M)
                )(targets["gt_masks"], targets["gt_boxes"], fg_gt_idx, fg_boxes)
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits, fg_cls.reshape(-1), gt_targets.reshape(-1, M, M), fg_valid.reshape(-1)
                )
            return None, losses
        else:
            P = proposal_boxes.shape[1]
            boxes_flat = proposal_boxes.reshape(-1, 4)
            batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
            x = self._shared_roi_transform(feats, boxes_flat, batch_idx, train=False)
            box_feat = x.mean(axis=(1, 2))
            predictions = self.box_predictor(box_feat, train=False)
            detections = self.box_predictor.inference(predictions, proposal_boxes, proposal_valid, image_sizes)
            if self.mask_head is not None:
                B_, D = detections["pred_classes"].shape
                det_flat = detections["pred_boxes"].reshape(-1, 4)
                det_bidx = jnp.repeat(jnp.arange(B_, dtype=jnp.int32), D)
                xm = self._shared_roi_transform(feats, det_flat, det_bidx, train=False)
                mask_logits = self.mask_head(xm, train=False)
                probs = mask_rcnn_inference(mask_logits, detections["pred_classes"].reshape(-1))
                M = probs.shape[-1]
                detections["pred_masks"] = probs.reshape(B_, D, M, M)
            return detections, {}
