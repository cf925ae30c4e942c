"""TensorMask meta-architecture (reference projects/TensorMask/tensormask/arch.py).

Dense sliding-window instance segmentation with the tensor-bipyramid head:
per FPN level the head predicts classification logits, box deltas, and a
dense V x U mask window at every location; with BIPYRAMID_ON the coarse-level
mask features are upsampled to the finest level, fused, predicted at
(msize * 2^lvl)^2 resolution and converted aligned->natural by
``swap_align2nat`` (our pure-XLA quadrilinear gather, layers.py).

TPU fixed-shape redesign of the reference's dynamic structures:
- the per-image assignment rule (containment + scale + spatial + uniqueness,
  arch.py:42-133) is one vectorized [G, R] boolean computation over padded GT;
- the reference's variable per-(level, anchor) mask-target lists
  (arch.py:583-612) become static per-level foreground budgets: top-K
  foreground sites per image per (level, anchor) bucket, BCE weighted by slot
  validity;
- inference is the padded top-k -> batched-NMS pipeline; each kept
  detection's mask window is gathered bucket-by-bucket and bilinearly
  resized to one static MASK_TEST_SIZE so downstream paste is uniform (the
  reference pastes variable-size mask lists on host, arch.py:136-179).
  Masks live in the ANCHOR box frame: paste with ``mask_boxes``, not
  ``pred_boxes`` (arch.py:724-736).
"""

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.anchor_generator import build_anchor_generator
from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.box_regression import Box2BoxTransform
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.roi_heads.roi_heads import crop_gt_masks_to_proposals
from detectron2_tpu.ops.nms import batched_nms_padded
from detectron2_tpu.projects.tensormask.layers import swap_align2nat

__all__ = ["TensorMask", "TensorMaskHead", "tensormask_assignment"]


def sigmoid_focal_loss_star(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float, gamma: float
) -> jnp.ndarray:
    """Focal loss* (the star variant; fvcore sigmoid_focal_loss_star used at
    reference arch.py:447). Elementwise, no reduction."""
    shifted = gamma * (logits * (2.0 * targets - 1.0))
    loss = -jax.nn.log_sigmoid(shifted) / gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1.0 - alpha) * (1.0 - targets))
    return loss


def tensormask_assignment(
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G] bool
    anchors: jnp.ndarray,  # [R, 4]
    unit_lengths: jnp.ndarray,  # [R]
    min_anchor_size: float,
    scale_thresh: float = 2.0,
    spatial_thresh: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The TensorMask assignment rule (reference arch.py:42-133), padded.

    An anchor is positive iff it (a) CONTAINS its gt box, (b) is not more
    than ``scale_thresh`` x larger than it (after deducting the sampling
    stride), (c) its center is within ``spatial_thresh`` unit lengths of the
    gt center — and matches exactly one gt (uniqueness).

    Returns (matches int32 [R], labels int8 [R] in {0, 1}).
    """
    lt = jnp.minimum(gt_boxes[:, None, :2], anchors[None, :, :2])
    rb = jnp.maximum(gt_boxes[:, None, 2:], anchors[None, :, 2:])
    contain = jnp.all(
        jnp.concatenate([lt, rb], axis=-1) == anchors[None, :, :], axis=-1
    )  # [G, R]

    gt_size = jnp.max(gt_boxes[:, 2:] - gt_boxes[:, :2], axis=-1)  # [G]
    gt_upper = jnp.maximum(gt_size * scale_thresh, min_anchor_size)
    anchor_size = jnp.max(anchors[:, 2:] - anchors[:, :2], axis=-1) - unit_lengths  # [R]
    scale_ok = (gt_upper[:, None] - anchor_size[None, :]) >= 0

    gt_center = (gt_boxes[:, 2:] + gt_boxes[:, :2]) / 2  # [G, 2]
    anchor_center = (anchors[:, 2:] + anchors[:, :2]) / 2  # [R, 2]
    off = (gt_center[:, None, :] - anchor_center[None, :, :]) / unit_lengths[None, :, None]
    spatial_ok = jnp.sum(off * off, axis=-1) <= spatial_thresh * spatial_thresh

    assign = contain & scale_ok & spatial_ok & gt_valid[:, None]  # [G, R]
    a_int = assign.astype(jnp.int32)
    matched_vals = a_int.max(axis=0)  # [R]
    matches = jnp.argmax(a_int, axis=0).astype(jnp.int32)
    labels = (matched_vals == 1).astype(jnp.int8)
    # uniqueness: anchors claimed by >1 gt become background (uniqueness_on)
    labels = jnp.where(a_int.sum(axis=0) > 1, jnp.int8(0), labels)
    return matches, labels


class TensorMaskHead(nn.Module):
    """cls/box/mask towers shared across levels + per-mask-size predictors +
    tensor bipyramid (reference arch.py:754-913)."""

    num_classes: int
    num_anchors: int
    mask_sizes: Tuple[int, ...]
    num_levels: int
    num_convs: int = 4
    cls_channels: int = 256
    bbox_channels: int = 128
    mask_channels: int = 128
    mask_on: bool = True
    aligned_on: bool = False
    bipyramid_on: bool = False

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        """features: per-level [B, Hl, Wl, C], finest first.

        Returns:
            logits: per level [B, Hl, Wl, A*K]
            deltas: per level [B, Hl, Wl, A*4]
            masks: per level, per anchor [B, Hl, Wl, cur_size^2] (or None)
        """

        def tower(name, channels):
            return [
                Conv2d(
                    features=channels, kernel_size=3, padding=1, activation=nn.relu,
                    kernel_init_std=0.01, name=f"{name}{i}",
                )
                for i in range(self.num_convs)
            ]

        cls_subnet = tower("cls_subnet", self.cls_channels)
        cls_score = Conv2d(
            features=self.num_anchors * self.num_classes,
            kernel_size=3,
            padding=1,
            kernel_init_std=0.01,
            bias_init_value=-math.log((1 - 0.01) / 0.01),
            name="cls_score",
        )
        bbox_subnet = tower("bbox_subnet", self.bbox_channels)
        bbox_pred = Conv2d(
            features=self.num_anchors * 4, kernel_size=3, padding=1,
            kernel_init_std=0.01, name="bbox_pred"
        )

        def run(subnet, x):
            for conv in subnet:
                x = conv(x, train=train)
            return x

        logits = [cls_score(run(cls_subnet, x), train=train) for x in features]
        deltas = [bbox_pred(run(bbox_subnet, x), train=train) for x in features]

        masks = None
        if self.mask_on:
            mask_subnet = tower("mask_subnet", self.mask_channels)
            mask_preds = {
                m: Conv2d(
                    features=m * m, kernel_size=1, kernel_init_std=0.01,
                    name=f"mask_pred_{m:02d}",
                )
                for m in self.mask_sizes
            }
            feats = [run(mask_subnet, x) for x in features]

            if self.bipyramid_on:
                fuse = Conv2d(
                    features=self.mask_channels, kernel_size=3, padding=1,
                    activation=nn.relu, kernel_init_std=0.01, name="mask_fuse",
                )
                hi = feats[0]
                B, H0, W0, C = hi.shape
                up_feats = []
                for lvl, f in enumerate(feats):
                    if lvl > 0:
                        # the reference upsamples by EXACTLY 2^lvl then crops
                        # to the finest map (arch.py:895-901: interpolate
                        # scale_factor=lambda, then [:, :, :H, :W]) — resizing
                        # straight to (H0, W0) would shift sample positions
                        # whenever ceil-rounded Hl * 2^lvl != H0
                        B_, Hl, Wl, C_ = f.shape
                        lam = 2**lvl
                        f = jax.image.resize(
                            f, (B_, Hl * lam, Wl * lam, C_), method="bilinear"
                        )[:, :H0, :W0, :]
                    up_feats.append(fuse(f + hi, train=train))
                feats = up_feats

            masks = []
            for lvl, f in enumerate(feats):
                cur = []
                for m in self.mask_sizes:
                    pm = mask_preds[m](f, train=train).astype(jnp.float32)
                    if self.aligned_on:
                        lam = 2**lvl if self.bipyramid_on else 1
                        pm = swap_align2nat(pm, lam)
                    cur.append(pm)
                masks.append(cur)
        return logits, deltas, masks


@META_ARCH_REGISTRY.register()
class TensorMask(nn.Module):
    """The TensorMask model (reference arch.py:301-751)."""

    backbone: Backbone
    head: TensorMaskHead
    anchor_generator: object
    in_features: Tuple[str, ...]
    num_classes: int
    mask_sizes: Tuple[int, ...]
    min_anchor_size: float
    bbox_reg_weights: Tuple[float, ...] = (1.5, 1.5, 0.75, 0.75)
    focal_loss_alpha: float = 0.3
    focal_loss_gamma: float = 3.0
    mask_on: bool = True
    mask_loss_weight: float = 2.0
    mask_pos_weight: float = 1.5
    bipyramid_on: bool = False
    score_threshold: float = 0.05
    topk_candidates: int = 6000
    nms_threshold: float = 0.5
    detections_im: int = 100
    mask_gt_budgets: Tuple[int, ...] = (64, 32, 16, 8, 4, 4)
    mask_test_size: int = 28
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    compute_dtype: str = "bfloat16"

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        in_features = tuple(cfg.MODEL.TENSOR_MASK.IN_FEATURES)
        feature_shapes = [shapes[f] for f in in_features]
        strides = [s.stride for s in feature_shapes]
        sizes0 = cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]
        mask_sizes = tuple(int(s) // strides[0] for s in sizes0)
        head = TensorMaskHead(
            num_classes=cfg.MODEL.TENSOR_MASK.NUM_CLASSES,
            num_anchors=len(sizes0),
            mask_sizes=mask_sizes,
            num_levels=len(in_features),
            num_convs=cfg.MODEL.TENSOR_MASK.NUM_CONVS,
            cls_channels=cfg.MODEL.TENSOR_MASK.CLS_CHANNELS,
            bbox_channels=cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS,
            mask_channels=cfg.MODEL.TENSOR_MASK.MASK_CHANNELS,
            mask_on=cfg.MODEL.MASK_ON,
            aligned_on=cfg.MODEL.TENSOR_MASK.ALIGNED_ON,
            bipyramid_on=cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON,
        )
        return cls(
            backbone=backbone,
            head=head,
            anchor_generator=build_anchor_generator(cfg, feature_shapes),
            in_features=in_features,
            num_classes=cfg.MODEL.TENSOR_MASK.NUM_CLASSES,
            mask_sizes=mask_sizes,
            min_anchor_size=min(sizes0) - strides[0],
            bbox_reg_weights=tuple(cfg.MODEL.TENSOR_MASK.BBOX_REG_WEIGHTS),
            focal_loss_alpha=cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_ALPHA,
            focal_loss_gamma=cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA,
            mask_on=cfg.MODEL.MASK_ON,
            mask_loss_weight=cfg.MODEL.TENSOR_MASK.MASK_LOSS_WEIGHT,
            mask_pos_weight=cfg.MODEL.TENSOR_MASK.POSITIVE_WEIGHT,
            bipyramid_on=cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON,
            score_threshold=cfg.MODEL.TENSOR_MASK.SCORE_THRESH_TEST,
            topk_candidates=cfg.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST,
            nms_threshold=cfg.MODEL.TENSOR_MASK.NMS_THRESH_TEST,
            detections_im=cfg.TEST.DETECTIONS_PER_IMAGE,
            mask_gt_budgets=tuple(cfg.MODEL.TENSOR_MASK.MASK_GT_BUDGETS),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )

    def _transform(self):
        return Box2BoxTransform(weights=self.bbox_reg_weights)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = ((batch["image"].astype(jnp.float32) - mean) / std).astype(
            jnp.dtype(self.compute_dtype)
        )
        features = self.backbone(images, train=train)
        feats = [features[f] for f in self.in_features]
        logits_l, deltas_l, masks_l = self.head(feats, train=train)

        B = feats[0].shape[0]
        A = len(self.mask_sizes)
        K = self.num_classes
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors_l = self.anchor_generator(grid_sizes)  # per level [HWA, 4]
        strides = [s for s in self.anchor_generator.strides]
        units_l = [
            jnp.full((a.shape[0],), float(st), jnp.float32)
            for a, st in zip(anchors_l, strides)
        ]

        # flatten level predictions to [B, R, K] / [B, R, 4] in (h, w, a) order
        logits = jnp.concatenate(
            [l.reshape(B, -1, K).astype(jnp.float32) for l in logits_l], axis=1
        )
        deltas = jnp.concatenate(
            [d.reshape(B, -1, 4).astype(jnp.float32) for d in deltas_l], axis=1
        )
        anchors = jnp.concatenate(anchors_l, axis=0)  # [R, 4]
        units = jnp.concatenate(units_l, axis=0)  # [R]

        if train:
            return self.losses(
                batch, logits, deltas, masks_l, anchors, units, grid_sizes
            )
        return self.inference(batch, logits, deltas, masks_l, anchors, grid_sizes)

    # ------------------------------------------------------------------ train

    def losses(self, batch, logits, deltas, masks_l, anchors, units, grid_sizes):
        gt_boxes = batch["gt_boxes"]  # [B, G, 4]
        gt_classes = batch["gt_classes"]  # [B, G]
        gt_valid = batch["gt_valid"]  # [B, G]
        B, R, K = logits.shape
        A = len(self.mask_sizes)

        matches, labels = jax.vmap(
            lambda gb, gv: tensormask_assignment(
                gb, gv, anchors, units, self.min_anchor_size
            )
        )(gt_boxes, gt_valid)  # [B, R] each
        fg = labels == 1  # [B, R]
        num_fg = fg.sum()
        normalizer = jnp.maximum(num_fg.astype(jnp.float32), 1.0)

        # classification: one-hot target over matched gt classes
        matched_cls = jnp.take_along_axis(gt_classes, matches.astype(jnp.int32), axis=1)
        onehot = jax.nn.one_hot(jnp.where(fg, matched_cls, -1), K, dtype=jnp.float32)
        loss_cls = (
            sigmoid_focal_loss_star(
                logits, onehot, self.focal_loss_alpha, self.focal_loss_gamma
            ).sum()
            / normalizer
        )

        # box regression on foregrounds (dense, weighted)
        matched_boxes = jnp.take_along_axis(
            gt_boxes, matches[..., None].astype(jnp.int32), axis=1
        )  # [B, R, 4]
        tf = self._transform()
        gt_deltas = jax.vmap(lambda mb: tf.get_deltas(anchors, mb))(matched_boxes)
        loss_box = (
            jnp.abs(deltas - gt_deltas) * fg[..., None].astype(jnp.float32)
        ).sum() / normalizer

        losses = {"loss_cls": loss_cls, "loss_box_reg": loss_box}

        if self.mask_on and masks_l is not None:
            gt_masks = batch["gt_masks"]  # [B, G, Ms, Ms]
            loss_mask = 0.0
            offset = 0
            for lvl, (Hl, Wl) in enumerate(grid_sizes):
                n_l = Hl * Wl * A
                fg_l = fg[:, offset : offset + n_l].reshape(B, Hl * Wl, A)
                matches_l = matches[:, offset : offset + n_l].reshape(B, Hl * Wl, A)
                anchors_lvl = anchors[offset : offset + n_l].reshape(Hl * Wl, A, 4)
                budget = self.mask_gt_budgets[min(lvl, len(self.mask_gt_budgets) - 1)]
                factor = 2**lvl if self.bipyramid_on else 1
                for anc in range(A):
                    msize = self.mask_sizes[anc] * factor
                    Kb = min(budget, Hl * Wl)
                    pred = masks_l[lvl][anc].reshape(B, Hl * Wl, msize * msize)

                    def per_image(fg_i, match_i, pred_i, gtm_i, gtb_i):
                        # top-K foreground sites of this (lvl, anc) bucket
                        prio = fg_i.astype(jnp.float32)
                        _, sites = jax.lax.top_k(prio, Kb)  # [Kb]
                        valid = jnp.take(fg_i, sites)
                        gt_idx = jnp.take(match_i, sites)
                        pm = jnp.take(pred_i, sites, axis=0)  # [Kb, m*m]
                        boxes = anchors_lvl[sites, anc]  # [Kb, 4]
                        tgt = crop_gt_masks_to_proposals(
                            gtm_i, gtb_i, gt_idx, boxes, msize
                        )  # [Kb, m, m]
                        return pm.reshape(Kb, msize, msize), tgt, valid

                    pm, tgt, valid = jax.vmap(per_image)(
                        fg_l[:, :, anc], matches_l[:, :, anc], pred, gt_masks, gt_boxes
                    )
                    # weighted BCE with pos_weight (reference arch.py:486-499)
                    t = tgt.astype(jnp.float32)
                    logp = jax.nn.log_sigmoid(pm)
                    lognp = jax.nn.log_sigmoid(-pm)
                    bce = -(self.mask_pos_weight * t * logp + (1.0 - t) * lognp)
                    w = valid.astype(jnp.float32)[:, :, None, None]
                    scale = self.mask_loss_weight / float(msize * msize)
                    loss_mask = loss_mask + (bce * w).sum() * scale
                offset += n_l
            losses["loss_mask"] = loss_mask / normalizer
        return losses

    # -------------------------------------------------------------- inference

    def inference(self, batch, logits, deltas, masks_l, anchors, grid_sizes):
        B, R, K = logits.shape
        A = len(self.mask_sizes)
        probs = jax.nn.sigmoid(logits)  # [B, R, K]
        tf = self._transform()
        image_sizes = batch["image_sizes"]

        flat = probs.reshape(B, R * K)
        flat = jnp.where(flat > self.score_threshold, flat, -jnp.inf)
        n_cand = min(self.topk_candidates, R * K)

        def per_image(flat_i, deltas_i, hw):
            top_p, top_idx = jax.lax.top_k(flat_i, n_cand)
            cls = (top_idx % K).astype(jnp.int32)
            site = top_idx // K  # [n_cand] anchor index
            boxes = tf.apply_deltas(deltas_i[site], anchors[site])
            # no pre-NMS clipping (reference arch.py:716-721 runs NMS on the
            # raw decoded boxes; detector_postprocess clips afterwards)
            del hw
            valid = jnp.isfinite(top_p)
            keep = batched_nms_padded(boxes, top_p, cls, self.nms_threshold, valid=valid)
            scores = jnp.where(keep, top_p, -jnp.inf)
            D = min(self.detections_im, n_cand)
            out_s, oi = jax.lax.top_k(scores, D)
            out_valid = jnp.isfinite(out_s)
            return (
                boxes[oi],
                jnp.where(out_valid, out_s, 0.0),
                cls[oi],
                site[oi],
                out_valid,
            )

        pb, ps, pc, psite, pv = jax.vmap(per_image)(flat, deltas, image_sizes)
        out = {
            "pred_boxes": pb,
            "scores": ps,
            "pred_classes": pc,
            "valid": pv,
        }

        if self.mask_on and masks_l is not None:
            D = pb.shape[1]
            S = self.mask_test_size
            out_masks = jnp.zeros((B, D, S, S), jnp.float32)
            mask_boxes = jnp.zeros((B, D, 4), jnp.float32)
            offset = 0
            for lvl, (Hl, Wl) in enumerate(grid_sizes):
                n_l = Hl * Wl * A
                factor = 2**lvl if self.bipyramid_on else 1
                anchors_lvl = anchors[offset : offset + n_l].reshape(Hl * Wl, A, 4)
                for anc in range(A):
                    msize = self.mask_sizes[anc] * factor
                    pred = masks_l[lvl][anc].reshape(B, Hl * Wl, msize, msize)
                    # detection site -> this bucket's flat (h, w) index
                    rel = psite - offset  # [B, D]
                    in_bucket = (
                        (psite >= offset)
                        & (psite < offset + n_l)
                        & (rel % A == anc)
                    )
                    hw_idx = jnp.clip(rel // A, 0, Hl * Wl - 1)
                    gathered = jnp.take_along_axis(
                        pred.reshape(B, Hl * Wl, msize * msize),
                        hw_idx[..., None],
                        axis=1,
                    ).reshape(B, D, msize, msize)
                    resized = jax.image.resize(
                        gathered, (B, D, S, S), method="bilinear"
                    )
                    out_masks = jnp.where(
                        in_bucket[..., None, None], jax.nn.sigmoid(resized), out_masks
                    )
                    abox = anchors_lvl[hw_idx, anc]  # [B, D, 4]
                    mask_boxes = jnp.where(in_bucket[..., None], abox, mask_boxes)
                offset += n_l
            out["pred_masks"] = out_masks
            out["mask_boxes"] = mask_boxes  # paste frame (anchor boxes)
        return out
