"""Box regression and classification losses, jit-friendly (sum-reduced with
explicit masks instead of dynamic-shape filtering).

Covers the reference's layers/losses.py (diou/ciou) plus the fvcore losses it
imports (smooth_l1, giou, sigmoid_focal_loss; see reference
modeling/box_regression.py:5 and retinanet.py).
"""

import math

import jax
import jax.numpy as jnp

__all__ = ["smooth_l1_loss", "giou_loss", "diou_loss", "ciou_loss", "sigmoid_focal_loss", "cross_entropy"]


def smooth_l1_loss(input: jnp.ndarray, target: jnp.ndarray, beta: float, reduction: str = "none"):
    """Huber-style smooth L1: quadratic below beta, linear above. beta=0 is
    pure L1 (the d2 default; fvcore smooth_l1_loss semantics)."""
    diff = jnp.abs(input - target)
    if beta < 1e-5:
        loss = diff
    else:
        loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return _reduce(loss, reduction)


def _split_boxes(b):
    return b[..., 0], b[..., 1], b[..., 2], b[..., 3]


def _box_iou_and_union(boxes1, boxes2):
    x1, y1, x2, y2 = _split_boxes(boxes1)
    x1g, y1g, x2g, y2g = _split_boxes(boxes2)

    xkis1 = jnp.maximum(x1, x1g)
    ykis1 = jnp.maximum(y1, y1g)
    xkis2 = jnp.minimum(x2, x2g)
    ykis2 = jnp.minimum(y2, y2g)

    intsct = jnp.clip(xkis2 - xkis1, 0, None) * jnp.clip(ykis2 - ykis1, 0, None)
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsct
    iou = intsct / (union + 1e-7)
    return iou, union


def giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray, reduction: str = "none"):
    """Generalized IoU loss (fvcore giou_loss semantics)."""
    x1, y1, x2, y2 = _split_boxes(boxes1)
    x1g, y1g, x2g, y2g = _split_boxes(boxes2)

    iou, union = _box_iou_and_union(boxes1, boxes2)

    # smallest enclosing box
    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)

    area_c = (xc2 - xc1) * (yc2 - yc1)
    miou = iou - ((area_c - union) / (area_c + 1e-7))
    return _reduce(1 - miou, reduction)


def diou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray, reduction: str = "none"):
    """Distance IoU loss (reference layers/losses.py:5)."""
    x1, y1, x2, y2 = _split_boxes(boxes1)
    x1g, y1g, x2g, y2g = _split_boxes(boxes2)

    iou, _ = _box_iou_and_union(boxes1, boxes2)

    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    diag_len = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + 1e-7

    xp, yp = (x2 + x1) / 2, (y2 + y1) / 2
    xg, yg = (x2g + x1g) / 2, (y2g + y1g) / 2
    dist = (xp - xg) ** 2 + (yp - yg) ** 2

    return _reduce(1 - iou + dist / diag_len, reduction)


def ciou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray, reduction: str = "none"):
    """Complete IoU loss (reference layers/losses.py:66)."""
    x1, y1, x2, y2 = _split_boxes(boxes1)
    x1g, y1g, x2g, y2g = _split_boxes(boxes2)

    iou, _ = _box_iou_and_union(boxes1, boxes2)

    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    diag_len = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + 1e-7

    xp, yp = (x2 + x1) / 2, (y2 + y1) / 2
    xg, yg = (x2g + x1g) / 2, (y2g + y1g) / 2
    dist = (xp - xg) ** 2 + (yp - yg) ** 2

    w_pred = x2 - x1
    h_pred = jnp.maximum(y2 - y1, 1e-7)
    w_gt = x2g - x1g
    h_gt = jnp.maximum(y2g - y1g, 1e-7)

    v = (4.0 / (math.pi**2)) * (jnp.arctan(w_gt / h_gt) - jnp.arctan(w_pred / h_pred)) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + 1e-7))

    return _reduce(1 - iou + dist / diag_len + alpha * v, reduction)


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = -1,
    gamma: float = 2,
    reduction: str = "none",
):
    """Focal loss on logits (fvcore sigmoid_focal_loss semantics; used by
    RetinaNet, reference retinanet.py:160)."""
    p = jax.nn.sigmoid(inputs)
    ce_loss = _bce_with_logits(inputs, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce_loss * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return _reduce(loss, reduction)


def _bce_with_logits(logits, targets):
    """Numerically stable binary cross entropy on logits."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


binary_cross_entropy_with_logits = _bce_with_logits


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean", ignore_index: int = -100):
    """Softmax cross entropy with integer labels and ignore_index semantics
    (torch F.cross_entropy parity, used throughout the reference heads)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "mean":
        return nll.sum() / jnp.maximum(valid.sum(), 1)
    if reduction == "sum":
        return nll.sum()
    return nll


def _reduce(loss, reduction: str):
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss
