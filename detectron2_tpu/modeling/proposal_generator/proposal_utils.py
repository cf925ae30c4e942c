"""Proposal selection: fixed-shape top-k + NMS pipeline.

Re-designs reference detectron2/modeling/proposal_generator/proposal_utils.py:
``find_top_rpn_proposals`` (:22-135) is dynamic-shape end to end (topk →
filter → nms → topk); here every stage is padded:

1. per-level top-k (static k = min(pre_nms_topk, HWA_level)),
2. clip to the per-image true size; kill tiny / non-finite boxes by setting
   score = -inf (instead of dropping rows),
3. per-level greedy NMS via ops.nms (tiled, exact),
4. one final top-k of post_nms_topk over the union of levels.

Output is always [B, post_nms_topk] boxes + logits + validity mask.
"""

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.nms import nms_padded

__all__ = ["find_top_rpn_proposals_padded", "add_ground_truth_to_proposals_padded"]


def _process_level(
    boxes: jnp.ndarray,  # [K, 4] decoded proposals of one image, one level
    logits: jnp.ndarray,  # [K]
    image_hw: jnp.ndarray,  # [2] (h, w) true image size
    nms_thresh: float,
    min_box_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clip/filter/NMS one level of one image. Returns (boxes, masked logits)."""
    h = image_hw[0].astype(boxes.dtype)
    w = image_hw[1].astype(boxes.dtype)
    x1 = jnp.clip(boxes[:, 0], 0, w)
    y1 = jnp.clip(boxes[:, 1], 0, h)
    x2 = jnp.clip(boxes[:, 2], 0, w)
    y2 = jnp.clip(boxes[:, 3], 0, h)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    finite = jnp.all(jnp.isfinite(boxes), axis=-1) & jnp.isfinite(logits)
    big_enough = ((x2 - x1) > min_box_size) & ((y2 - y1) > min_box_size)
    valid = finite & big_enough
    boxes = jnp.where(valid[:, None], boxes, 0.0)

    keep = nms_padded(boxes, jnp.where(valid, logits, -jnp.inf), nms_thresh, valid=valid)
    logits = jnp.where(keep & valid, logits, -jnp.inf)
    return boxes, logits


def find_top_rpn_proposals_padded(
    proposals: List[jnp.ndarray],  # per level [B, Ai, 4]
    pred_objectness_logits: List[jnp.ndarray],  # per level [B, Ai]
    image_sizes: jnp.ndarray,  # [B, 2] (h, w)
    nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    min_box_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Returns:
        boxes: [B, post_nms_topk, 4]
        logits: [B, post_nms_topk] (-inf on padding)
        valid: bool [B, post_nms_topk]
    """
    B = proposals[0].shape[0]

    level_boxes = []
    level_logits = []
    for boxes_l, logits_l in zip(proposals, pred_objectness_logits):
        K = min(pre_nms_topk, logits_l.shape[1])
        top_logits, idx = jax.lax.top_k(logits_l, K)  # [B, K]
        top_boxes = jnp.take_along_axis(boxes_l, idx[..., None], axis=1)  # [B, K, 4]

        b, l = jax.vmap(
            lambda bx, lg, hw: _process_level(bx, lg, hw, nms_thresh, min_box_size)
        )(top_boxes, top_logits, image_sizes)
        level_boxes.append(b)
        level_logits.append(l)

    all_boxes = jnp.concatenate(level_boxes, axis=1)  # [B, sumK, 4]
    all_logits = jnp.concatenate(level_logits, axis=1)  # [B, sumK]

    k = min(post_nms_topk, all_logits.shape[1])
    top_logits, idx = jax.lax.top_k(all_logits, k)
    top_boxes = jnp.take_along_axis(all_boxes, idx[..., None], axis=1)
    valid = jnp.isfinite(top_logits)
    if k < post_nms_topk:
        pad = post_nms_topk - k
        top_boxes = jnp.pad(top_boxes, ((0, 0), (0, pad), (0, 0)))
        top_logits = jnp.pad(top_logits, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return top_boxes, top_logits, valid


def add_ground_truth_to_proposals_padded(
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_valid: jnp.ndarray,  # [B, G]
    proposals: jnp.ndarray,  # [B, P, 4]
    logits: jnp.ndarray,  # [B, P]
    valid: jnp.ndarray,  # [B, P]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Append (padded) GT boxes to the proposals with near-certain objectness
    (reference proposal_utils.py:138-204; the gt logit is
    log((1-eps)/eps) ≈ 23, improving early training convergence).

    Returns [B, P+G, ...] arrays.
    """
    gt_logit_value = math.log((1.0 - 1e-10) / (1 - (1.0 - 1e-10)))
    gt_logits = jnp.where(gt_valid, gt_logit_value, -jnp.inf)
    out_boxes = jnp.concatenate([proposals, gt_boxes], axis=1)
    out_logits = jnp.concatenate([logits, gt_logits], axis=1)
    out_valid = jnp.concatenate([valid, gt_valid], axis=1)
    return out_boxes, out_logits, out_valid
