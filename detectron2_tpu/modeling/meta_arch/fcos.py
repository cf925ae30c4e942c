"""FCOS: anchor-free one-stage detector
(reference detectron2/modeling/meta_arch/fcos.py:25-328).

One "anchor" (point box) per location; matching by the FCOS protocol
re-expressed fixed-shape: for every (location, gt) pair compute (a) center
distance, (b) whether the location's distance-to-edges fits the level's size
range, then each location takes the min-area feasible gt. Centerness is an
extra head multiplied into the score at inference.
"""

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import sigmoid_focal_loss, giou_loss, binary_cross_entropy_with_logits
from detectron2_tpu.modeling.anchor_generator import DefaultAnchorGenerator
from detectron2_tpu.modeling.backbone import build_backbone
from detectron2_tpu.modeling.box_regression import Box2BoxTransformLinear
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.meta_arch.dense_detector import (
    DenseDetector,
    decode_dense_predictions_padded,
    permute_to_N_HWA_K,
)
from detectron2_tpu.modeling.meta_arch.retinanet import RetinaNetHead

__all__ = ["FCOS", "FCOSHead"]


class FCOSHead(nn.Module):
    """RetinaNet-style subnets + a centerness predictor sharing the bbox
    tower (reference fcos.py:264-328)."""

    num_classes: int
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    norm: str = "GN"
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        from detectron2_tpu.layers.batch_norm import get_norm
        from detectron2_tpu.layers.wrappers import Conv2d

        cls_convs = [
            Conv2d(features=d, kernel_size=3, padding=1, use_bias=True,
                   norm=get_norm(self.norm, d), activation=nn.relu, name=f"cls_subnet{i}")
            for i, d in enumerate(self.conv_dims)
        ]
        box_convs = [
            Conv2d(features=d, kernel_size=3, padding=1, use_bias=True,
                   norm=get_norm(self.norm, d), activation=nn.relu, name=f"bbox_subnet{i}")
            for i, d in enumerate(self.conv_dims)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            bias_init=nn.initializers.constant(bias_value), name="cls_score")
        bbox_pred = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                            kernel_init=nn.initializers.normal(0.01), name="bbox_pred")
        ctrness = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01), name="ctrness")

        logits, bbox_reg, ctr = [], [], []
        for feat in features:
            c = feat
            for conv in cls_convs:
                c = conv(c, train=train)
            logits.append(cls_score(c))
            b = feat
            for conv in box_convs:
                b = conv(b, train=train)
            bbox_reg.append(nn.relu(bbox_pred(b)))
            ctr.append(ctrness(b))
        return logits, bbox_reg, ctr


@META_ARCH_REGISTRY.register()
class FCOS(DenseDetector):
    num_classes: int = 80
    center_sampling_radius: float = 1.5
    focal_loss_alpha: float = 0.25
    focal_loss_gamma: float = 2.0
    test_score_thresh: float = 0.2
    test_topk_candidates: int = 1000
    test_nms_thresh: float = 0.6
    max_detections_per_image: int = 100
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # TPU top-k dispatch (ops/topk.py), from cfg.TEST.{TOPK_RECALL_TARGET,EXACT_TOPK}
    topk_recall_target: float = 0.99
    exact_topk: bool = False

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        backbone_shape = backbone.output_shape()
        in_features = tuple(cfg.MODEL.RETINANET.IN_FEATURES)
        feature_shapes = [backbone_shape[f] for f in in_features]
        head = FCOSHead(
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            conv_dims=tuple([feature_shapes[0].channels] * cfg.MODEL.RETINANET.NUM_CONVS),
        )
        return cls(
            backbone=backbone,
            head=head,
            head_in_features=in_features,
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            strides=tuple(s.stride for s in feature_shapes),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            max_detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            topk_recall_target=cfg.TEST.TOPK_RECALL_TARGET,
            exact_topk=cfg.TEST.EXACT_TOPK,
        )

    def _point_anchors(self, grid_sizes) -> List[jnp.ndarray]:
        """Degenerate (point) anchors: one per location, size = stride/2 box
        around the center — used only for the linear transform and NMS decode."""
        gen = DefaultAnchorGenerator(
            sizes=[[s * 1.0] for s in self.strides[: len(grid_sizes)]],
            aspect_ratios=[[1.0]],
            strides=list(self.strides[: len(grid_sizes)]),
            offset=0.5,
        )
        return gen(grid_sizes)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False, raw: bool = False):
        images = self.preprocess_image(batch["image"])
        features_dict = self.backbone(images, train=train)
        features = [features_dict[f] for f in self.head_in_features]
        grid_sizes = [(f.shape[1], f.shape[2]) for f in features]
        anchors = self._point_anchors(grid_sizes)

        logits_l, deltas_l, ctr_l = self.head(features, train=train)
        logits_l = [permute_to_N_HWA_K(x, self.num_classes).astype(jnp.float32) for x in logits_l]
        deltas_l = [permute_to_N_HWA_K(x, 4).astype(jnp.float32) for x in deltas_l]
        ctr_l = [permute_to_N_HWA_K(x, 1).astype(jnp.float32) for x in ctr_l]

        if raw:
            # pre-decode head outputs for parity testing / export debugging
            return {"logits": logits_l, "deltas": deltas_l, "ctrness": ctr_l}
        if train:
            return self.losses(
                anchors, logits_l, deltas_l, ctr_l,
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
            )

        transform = Box2BoxTransformLinear(normalize_by_size=True)
        # score = sqrt(cls_prob * centerness) (reference fcos.py:238)
        probs_l = [
            jnp.sqrt(jax.nn.sigmoid(l) * jax.nn.sigmoid(c))
            for l, c in zip(logits_l, ctr_l)
        ]
        return decode_dense_predictions_padded(
            transform, anchors, probs_l, deltas_l, batch["image_sizes"],
            self.test_score_thresh, self.test_topk_candidates, self.test_nms_thresh,
            self.max_detections_per_image,
            topk_recall_target=self.topk_recall_target,
            exact_topk=self.exact_topk,
        )

    def _match_points_to_gt(self, anchors_cat, level_of_anchor, gt_boxes, gt_valid):
        """FCOS matching (reference fcos.py:120-180): a location matches a gt
        if (a) the location center is within center_sampling_radius * stride
        of the gt center, (b) the gt box's max edge distance fits the level's
        size range; ties broken by min gt area."""
        centers = (anchors_cat[:, :2] + anchors_cat[:, 2:]) / 2  # [R, 2]
        strides = jnp.asarray(self.strides, jnp.float32)[level_of_anchor]  # [R]

        # size ranges per level: [0, 64], [64, 128], ... (stride * 8 ladder)
        lows = jnp.asarray([0.0] + [s * 8.0 for s in self.strides[:-1]], jnp.float32)[level_of_anchor]
        highs = jnp.asarray([s * 8.0 for s in self.strides[:-1]] + [1e8], jnp.float32)[level_of_anchor]

        gt_centers = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2  # [G, 2]
        # center sampling: |center - gt_center| <= radius * stride (inf-norm)
        d_center = jnp.max(jnp.abs(centers[:, None, :] - gt_centers[None, :, :]), axis=-1)  # [R, G]
        in_center = d_center < self.center_sampling_radius * strides[:, None]

        # distances to gt edges
        l = centers[:, None, 0] - gt_boxes[None, :, 0]
        t = centers[:, None, 1] - gt_boxes[None, :, 1]
        r = gt_boxes[None, :, 2] - centers[:, None, 0]
        b = gt_boxes[None, :, 3] - centers[:, None, 1]
        dists = jnp.stack([l, t, r, b], axis=-1)  # [R, G, 4]
        inside = jnp.min(dists, axis=-1) > 0
        max_dist = jnp.max(dists, axis=-1)
        fits_level = (max_dist >= lows[:, None]) & (max_dist < highs[:, None])

        feasible = in_center & inside & fits_level & gt_valid[None, :]
        areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
        cost = jnp.where(feasible, areas[None, :], jnp.inf)
        matched = jnp.argmin(cost, axis=1).astype(jnp.int32)  # [R]
        is_fg = jnp.isfinite(jnp.min(cost, axis=1))
        return matched, is_fg

    def losses(self, anchors, logits_l, deltas_l, ctr_l, gt_boxes, gt_classes, gt_valid):
        anchors_cat = jnp.concatenate(anchors, axis=0)
        level_of_anchor = jnp.concatenate(
            [jnp.full((a.shape[0],), i, jnp.int32) for i, a in enumerate(anchors)]
        )
        logits = jnp.concatenate(logits_l, axis=1)
        deltas = jnp.concatenate(deltas_l, axis=1)
        ctr = jnp.concatenate(ctr_l, axis=1)[..., 0]
        B = logits.shape[0]
        transform = Box2BoxTransformLinear(normalize_by_size=True)

        def per_image(gt_b, gt_c, gt_v, logit, delta, c):
            matched, is_fg = self._match_points_to_gt(anchors_cat, level_of_anchor, gt_b, gt_v)
            m_boxes = gt_b[matched]
            m_cls = jnp.where(is_fg, gt_c[matched], self.num_classes)

            onehot = jax.nn.one_hot(jnp.clip(m_cls, 0, self.num_classes), self.num_classes + 1)[
                :, : self.num_classes
            ]
            cls_loss = sigmoid_focal_loss(
                logit, onehot, alpha=self.focal_loss_alpha, gamma=self.focal_loss_gamma
            ).sum(-1).sum()

            pred_boxes = transform.apply_deltas(delta, anchors_cat)
            reg = (giou_loss(pred_boxes, m_boxes) * is_fg).sum()

            # centerness targets (reference fcos.py:200-225)
            gt_deltas = transform.get_deltas(anchors_cat, m_boxes)
            lr_ = gt_deltas[:, [0, 2]]
            tb = gt_deltas[:, [1, 3]]
            ctrness = jnp.sqrt(
                jnp.clip(lr_.min(-1) / jnp.clip(lr_.max(-1), 1e-6), 0, None)
                * jnp.clip(tb.min(-1) / jnp.clip(tb.max(-1), 1e-6), 0, None)
            )
            ctr_loss = (binary_cross_entropy_with_logits(c, ctrness) * is_fg).sum()
            return cls_loss, reg, ctr_loss, is_fg.sum().astype(jnp.float32)

        cls_loss, reg_loss, ctr_loss, num_fg = jax.vmap(per_image)(
            gt_boxes, gt_classes, gt_valid, logits, deltas, ctr
        )
        normalizer = jnp.maximum(self._ema_loss_normalizer(num_fg.sum()), 1.0)
        return {
            "loss_fcos_cls": cls_loss.sum() / normalizer,
            "loss_fcos_loc": reg_loss.sum() / normalizer,
            "loss_fcos_ctr": ctr_loss.sum() / normalizer,
        }
