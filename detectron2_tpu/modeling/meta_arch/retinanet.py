"""RetinaNet (reference detectron2/modeling/meta_arch/retinanet.py:29-439).

Fixed-shape single-stage detector: anchor labeling (matcher with low-quality
matches), sigmoid focal loss over non-ignored anchors with an EMA foreground
normalizer, dense box regression on foreground anchors, padded top-k + NMS
decode.
"""

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.losses import sigmoid_focal_loss
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.anchor_generator import build_anchor_generator
from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.box_regression import Box2BoxTransform, _dense_box_regression_loss
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.meta_arch.dense_detector import (
    DenseDetector,
    decode_dense_predictions_padded,
    permute_to_N_HWA_K,
)
from detectron2_tpu.structures.boxes import pairwise_iou

__all__ = ["RetinaNet", "RetinaNetHead"]


class RetinaNetHead(nn.Module):
    """Two 4-conv subnets for classification and box regression, shared
    across levels; the cls predictor's bias is initialized so every anchor
    starts predicting prior_prob foreground (reference retinanet.py:311-400)."""

    num_classes: int
    num_anchors: int
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    norm: str = ""
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        cls_convs = [
            Conv2d(
                features=d,
                kernel_size=3,
                padding=1,
                use_bias=True,
                norm=get_norm(self.norm, d),
                activation=nn.relu,
                name=f"cls_subnet{i}",
            )
            for i, d in enumerate(self.conv_dims)
        ]
        box_convs = [
            Conv2d(
                features=d,
                kernel_size=3,
                padding=1,
                use_bias=True,
                norm=get_norm(self.norm, d),
                activation=nn.relu,
                name=f"bbox_subnet{i}",
            )
            for i, d in enumerate(self.conv_dims)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(
            features=self.num_anchors * self.num_classes,
            kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            name="cls_score",
        )
        bbox_pred = nn.Conv(
            features=self.num_anchors * 4,
            kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )

        logits, bbox_reg = [], []
        for feat in features:
            c = feat
            for conv in cls_convs:
                c = conv(c, train=train)
            logits.append(cls_score(c))
            b = feat
            for conv in box_convs:
                b = conv(b, train=train)
            bbox_reg.append(bbox_pred(b))
        return logits, bbox_reg


@META_ARCH_REGISTRY.register()
class RetinaNet(DenseDetector):
    """The RetinaNet meta-architecture."""

    anchor_generator: object = None
    box2box_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    matcher_cfg: Tuple = ((0.4, 0.5), (0, -1, 1), True)
    num_classes: int = 80
    focal_loss_alpha: float = 0.25
    focal_loss_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    box_reg_loss_type: str = "smooth_l1"
    test_score_thresh: float = 0.05
    test_topk_candidates: int = 1000
    test_nms_thresh: float = 0.5
    max_detections_per_image: int = 100
    # TPU top-k dispatch (ops/topk.py): approx_max_k recall target and the
    # exact-top-k override, from cfg.TEST.{TOPK_RECALL_TARGET,EXACT_TOPK}
    topk_recall_target: float = 0.99
    exact_topk: bool = False

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        backbone_shape = backbone.output_shape()
        head_in_features = tuple(cfg.MODEL.RETINANET.IN_FEATURES)
        feature_shapes = [backbone_shape[f] for f in head_in_features]
        anchor_generator = build_anchor_generator(cfg, feature_shapes)
        head = RetinaNetHead(
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            num_anchors=anchor_generator.num_anchors[0],
            conv_dims=tuple([feature_shapes[0].channels] * cfg.MODEL.RETINANET.NUM_CONVS),
            norm=cfg.MODEL.RETINANET.NORM,
            prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
        )
        return cls(
            backbone=backbone,
            head=head,
            head_in_features=head_in_features,
            anchor_generator=anchor_generator,
            box2box_weights=tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
            matcher_cfg=(
                tuple(cfg.MODEL.RETINANET.IOU_THRESHOLDS),
                tuple(cfg.MODEL.RETINANET.IOU_LABELS),
                True,
            ),
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            focal_loss_alpha=cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA,
            focal_loss_gamma=cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA,
            smooth_l1_beta=cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA,
            box_reg_loss_type=cfg.MODEL.RETINANET.BBOX_REG_LOSS_TYPE,
            test_score_thresh=cfg.MODEL.RETINANET.SCORE_THRESH_TEST,
            test_topk_candidates=cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST,
            test_nms_thresh=cfg.MODEL.RETINANET.NMS_THRESH_TEST,
            max_detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            topk_recall_target=cfg.TEST.TOPK_RECALL_TARGET,
            exact_topk=cfg.TEST.EXACT_TOPK,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False, raw: bool = False):
        images = self.preprocess_image(batch["image"])
        features_dict = self.backbone(images, train=train)
        features = [features_dict[f] for f in self.head_in_features]
        grid_sizes = [(f.shape[1], f.shape[2]) for f in features]
        anchors = self.anchor_generator(grid_sizes)

        logits_l, deltas_l = self.head(features, train=train)
        logits_l = [permute_to_N_HWA_K(x, self.num_classes).astype(jnp.float32) for x in logits_l]
        deltas_l = [permute_to_N_HWA_K(x, 4).astype(jnp.float32) for x in deltas_l]

        if raw:
            # pre-decode head outputs ([B, HWA, K] per level) for parity
            # testing / export debugging
            return {"logits": logits_l, "deltas": deltas_l}
        if train:
            return self.losses(
                anchors, logits_l, deltas_l, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
            )

        transform = Box2BoxTransform(weights=self.box2box_weights)
        probs_l = [jax.nn.sigmoid(x) for x in logits_l]
        return decode_dense_predictions_padded(
            transform,
            anchors,
            probs_l,
            deltas_l,
            batch["image_sizes"],
            self.test_score_thresh,
            self.test_topk_candidates,
            self.test_nms_thresh,
            self.max_detections_per_image,
            topk_recall_target=self.topk_recall_target,
            exact_topk=self.exact_topk,
        )

    def losses(self, anchors, logits_l, deltas_l, gt_boxes, gt_classes, gt_valid):
        """Focal + dense box regression with EMA normalizer
        (reference retinanet.py:160-273)."""
        anchors_cat = jnp.concatenate(anchors, axis=0)  # [R, 4]
        logits = jnp.concatenate(logits_l, axis=1)  # [B, R, C]
        deltas = jnp.concatenate(deltas_l, axis=1)  # [B, R, 4]
        B = logits.shape[0]

        th, lb, low_q = self.matcher_cfg
        matcher = Matcher(list(th), list(lb), allow_low_quality_matches=low_q)
        transform = Box2BoxTransform(weights=self.box2box_weights)

        def label_one(gt_b, gt_c, gt_v):
            iou = pairwise_iou(gt_b, anchors_cat)
            matched_idx, labels = matcher(iou, gt_valid=gt_v)
            cls = jnp.where(labels == 1, gt_c[matched_idx], self.num_classes)
            cls = jnp.where(labels == -1, -1, cls)  # ignored band
            matched_boxes = gt_b[matched_idx]
            return cls, matched_boxes

        gt_labels, matched_gt_boxes = jax.vmap(label_one)(gt_boxes, gt_classes, gt_valid)

        valid = gt_labels >= 0
        fg = (gt_labels >= 0) & (gt_labels < self.num_classes)
        num_fg = fg.sum().astype(jnp.float32)
        normalizer = self._ema_loss_normalizer(num_fg)
        normalizer = jnp.maximum(normalizer, 1.0)

        # classification: focal loss with one-hot targets over C (bg = all-zero)
        onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, self.num_classes), self.num_classes + 1)[
            ..., : self.num_classes
        ]
        cls_loss = sigmoid_focal_loss(
            logits, onehot, alpha=self.focal_loss_alpha, gamma=self.focal_loss_gamma
        ).sum(-1)
        loss_cls = (cls_loss * valid).sum() / normalizer

        anchors_b = jnp.broadcast_to(anchors_cat[None], deltas.shape[:2] + (4,))
        loss_box = (
            _dense_box_regression_loss(
                anchors_b,
                transform,
                deltas,
                matched_gt_boxes,
                fg,
                box_reg_loss_type=self.box_reg_loss_type,
                smooth_l1_beta=self.smooth_l1_beta,
            )
            / normalizer
        )

        return {"loss_cls": loss_cls, "loss_box_reg": loss_box}
