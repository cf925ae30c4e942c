"""Rotated RPN (reference detectron2/modeling/proposal_generator/rrpn.py).

RPN over (cx, cy, w, h, a) anchors: rotated IoU for label assignment, rotated
NMS for proposal selection; otherwise shares the padded RPN machinery.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.modeling.anchor_generator import build_anchor_generator
from detectron2_tpu.modeling.box_regression import Box2BoxTransformRotated
from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.proposal_generator.build import PROPOSAL_GENERATOR_REGISTRY
from detectron2_tpu.modeling.proposal_generator.rpn import RPN, build_rpn_head
from detectron2_tpu.modeling.sampling import subsample_labels_padded
from detectron2_tpu.ops.rotated_boxes_ops import nms_rotated_padded, pairwise_iou_rotated

__all__ = ["RRPN", "find_top_rrpn_proposals_padded"]


def find_top_rrpn_proposals_padded(
    proposals: List[jnp.ndarray],  # per level [B, Ai, 5]
    pred_objectness_logits: List[jnp.ndarray],
    image_sizes: jnp.ndarray,
    nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    min_box_size: float,
):
    """Rotated analogue of find_top_rpn_proposals_padded (reference
    rrpn.py:28-100): clip near-axis boxes, filter tiny, rotated NMS per level,
    global top-k."""
    B = proposals[0].shape[0]

    def process_level(boxes, logits, hw):
        h = hw[0].astype(boxes.dtype)
        w = hw[1].astype(boxes.dtype)
        # clip: only centers (rotated boxes clip by center containment)
        cx = jnp.clip(boxes[:, 0], 0, w)
        cy = jnp.clip(boxes[:, 1], 0, h)
        boxes = jnp.concatenate([cx[:, None], cy[:, None], boxes[:, 2:]], axis=1)
        finite = jnp.all(jnp.isfinite(boxes), axis=-1) & jnp.isfinite(logits)
        big = (boxes[:, 2] > min_box_size) & (boxes[:, 3] > min_box_size)
        valid = finite & big
        boxes = jnp.where(valid[:, None], boxes, 0.0)
        keep = nms_rotated_padded(boxes, jnp.where(valid, logits, -jnp.inf), nms_thresh, valid=valid)
        return boxes, jnp.where(keep & valid, logits, -jnp.inf)

    level_boxes, level_logits = [], []
    for boxes_l, logits_l in zip(proposals, pred_objectness_logits):
        K = min(pre_nms_topk, logits_l.shape[1])
        top_logits, idx = jax.lax.top_k(logits_l, K)
        top_boxes = jnp.take_along_axis(boxes_l, idx[..., None], axis=1)
        b, l = jax.vmap(process_level)(top_boxes, top_logits, image_sizes)
        level_boxes.append(b)
        level_logits.append(l)

    all_boxes = jnp.concatenate(level_boxes, axis=1)
    all_logits = jnp.concatenate(level_logits, axis=1)
    k = min(post_nms_topk, all_logits.shape[1])
    top_logits, idx = jax.lax.top_k(all_logits, k)
    top_boxes = jnp.take_along_axis(all_boxes, idx[..., None], axis=1)
    valid = jnp.isfinite(top_logits)
    return top_boxes, top_logits, valid


@PROPOSAL_GENERATOR_REGISTRY.register()
class RRPN(RPN):
    """Rotated region proposal network (reference rrpn.py:103-209)."""

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]) -> "RRPN":
        in_features = cfg.MODEL.RPN.IN_FEATURES
        shapes = [input_shape[f] for f in in_features]
        return cls(
            in_features=tuple(in_features),
            head=build_rpn_head(cfg, shapes),
            anchor_generator=build_anchor_generator(cfg, shapes),
            box2box_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS)
            if len(cfg.MODEL.RPN.BBOX_REG_WEIGHTS) == 5
            else (1.0, 1.0, 1.0, 1.0, 1.0),
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
            loss_weight_cls=cfg.MODEL.RPN.LOSS_WEIGHT,
            loss_weight_loc=cfg.MODEL.RPN.LOSS_WEIGHT * cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT,
            box_reg_loss_type=cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE,
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        )

    def _transform(self):
        return Box2BoxTransformRotated(weights=self.box2box_weights)

    @nn.compact
    def __call__(self, features, image_sizes, gt_boxes=None, gt_valid=None, train: bool = False):
        feats = [features[f] for f in self.in_features]
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)  # [HWA, 5] per level

        logits_l, deltas_l = self.head(feats, train=train)
        B = feats[0].shape[0]
        logits_l = [l.reshape(B, -1).astype(jnp.float32) for l in logits_l]
        deltas_l = [d.reshape(B, -1, 5).astype(jnp.float32) for d in deltas_l]

        losses = {}
        if train:
            assert gt_boxes is not None and gt_valid is not None
            rng = self.make_rng("sampling")
            losses = self._losses_rotated(anchors, logits_l, deltas_l, gt_boxes, gt_valid, rng)

        transform = self._transform()
        proposals = [
            jax.lax.stop_gradient(
                transform.apply_deltas(d.reshape(-1, 5), jnp.tile(a, (B, 1))).reshape(B, -1, 5)
            )
            for d, a in zip(deltas_l, anchors)
        ]
        logits_sg = [jax.lax.stop_gradient(l) for l in logits_l]
        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test
        boxes, obj_logits, valid = find_top_rrpn_proposals_padded(
            proposals, logits_sg, image_sizes, self.nms_thresh, pre, post, self.min_box_size
        )
        return (boxes, obj_logits, valid), losses

    def _losses_rotated(self, anchors, logits_l, deltas_l, gt_boxes, gt_valid, rng):
        anchors_cat = jnp.concatenate(anchors, axis=0)  # [R, 5]
        logits = jnp.concatenate(logits_l, axis=1)
        deltas = jnp.concatenate(deltas_l, axis=1)
        B = logits.shape[0]
        keys = jax.random.split(rng, B)
        matcher = self._matcher()
        transform = self._transform()
        S = self.batch_size_per_image

        def per_image(key, gt_b, gt_v, logit, delta):
            iou = pairwise_iou_rotated(gt_b, anchors_cat)
            matched_idx, match_labels = matcher(iou, gt_valid=gt_v)
            idx, valid, is_pos = subsample_labels_padded(
                key, match_labels.astype(jnp.int32), S, self.positive_fraction, bg_label=0
            )
            s_logits = logit[idx]
            cls_loss = (
                binary_cross_entropy_with_logits(s_logits, is_pos.astype(jnp.float32))
                * valid.astype(jnp.float32)
            ).sum()
            gt_deltas = transform.get_deltas(anchors_cat[idx], gt_b[matched_idx[idx]])
            loc = smooth_l1_loss(delta[idx], jax.lax.stop_gradient(gt_deltas), beta=self.smooth_l1_beta)
            loc_loss = (loc.sum(-1) * is_pos).sum()
            return cls_loss, loc_loss

        cls_loss, loc_loss = jax.vmap(per_image)(keys, gt_boxes, gt_valid, logits, deltas)
        normalizer = S * B
        return {
            "loss_rpn_cls": cls_loss.sum() / normalizer * self.loss_weight_cls,
            "loss_rpn_loc": loc_loss.sum() / normalizer * self.loss_weight_loc,
        }
