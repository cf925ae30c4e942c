"""Box delta encode/decode transforms + dense regression loss dispatch.

Parity with reference detectron2/modeling/box_regression.py (Box2BoxTransform
:21, Rotated :120, Linear :233, _dense_box_regression_loss :305), as pure jax
functions of fixed-shape arrays.
"""

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from detectron2_tpu.layers.losses import ciou_loss, diou_loss, giou_loss, smooth_l1_loss

__all__ = [
    "Box2BoxTransform",
    "Box2BoxTransformRotated",
    "Box2BoxTransformLinear",
    "_dense_box_regression_loss",
]

# Maximum dw/dh so exp() can't overflow: boxes can't stretch more than
# 1000/16 x per decode step (reference box_regression.py:14).
_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


class Box2BoxTransform:
    """The standard (dx, dy, dw, dh) box-to-box parameterization
    (reference box_regression.py:21-118)."""

    def __init__(self, weights: Tuple[float, float, float, float], scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """Encode target boxes relative to source boxes: [..., 4] -> [..., 4]."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        # guard padded (zero-size) rows: the outputs for them are masked by callers
        safe_w = jnp.maximum(src_w, 1e-6)
        safe_h = jnp.maximum(src_h, 1e-6)
        dx = wx * (tgt_cx - src_cx) / safe_w
        dy = wy * (tgt_cy - src_cy) / safe_h
        dw = ww * jnp.log(jnp.maximum(tgt_w, 1e-6) / safe_w)
        dh = wh * jnp.log(jnp.maximum(tgt_h, 1e-6) / safe_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Decode deltas against boxes.

        Args:
            deltas: [..., k*4]; boxes: [..., 4]
        Returns:
            [..., k*4]
        """
        boxes = boxes.astype(deltas.dtype)
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 4))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        out = jnp.stack(
            [
                pred_ctr_x - 0.5 * pred_w,
                pred_ctr_y - 0.5 * pred_h,
                pred_ctr_x + 0.5 * pred_w,
                pred_ctr_y + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(shape)


class Box2BoxTransformRotated:
    """(dx, dy, dw, dh, da) parameterization for rotated boxes
    (reference box_regression.py:120-230); da is normalized degrees."""

    def __init__(
        self,
        weights: Tuple[float, float, float, float, float],
        scale_clamp: float = _DEFAULT_SCALE_CLAMP,
    ):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        scx, scy, sw, sh, sa = (src_boxes[..., i] for i in range(5))
        tcx, tcy, tw, th, ta = (target_boxes[..., i] for i in range(5))
        wx, wy, ww, wh, wa = self.weights
        safe_w = jnp.maximum(sw, 1e-6)
        safe_h = jnp.maximum(sh, 1e-6)
        dx = wx * (tcx - scx) / safe_w
        dy = wy * (tcy - scy) / safe_h
        dw = ww * jnp.log(jnp.maximum(tw, 1e-6) / safe_w)
        dh = wh * jnp.log(jnp.maximum(th, 1e-6) / safe_h)
        da = ta - sa
        da = (da + 180.0) % 360.0 - 180.0  # normalize to (-180, 180]
        da = da * (wa * math.pi / 180.0)
        return jnp.stack([dx, dy, dw, dh, da], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        assert deltas.shape[-1] % 5 == 0
        boxes = boxes.astype(deltas.dtype)
        cx, cy, w, h, a = (boxes[..., i] for i in range(5))
        wx, wy, ww, wh, wa = self.weights

        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 5))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)
        da = d[..., 4] * (180.0 / (math.pi * wa))

        pcx = dx * w[..., None] + cx[..., None]
        pcy = dy * h[..., None] + cy[..., None]
        pw = jnp.exp(dw) * w[..., None]
        ph = jnp.exp(dh) * h[..., None]
        pa = da + a[..., None]
        pa = (pa + 180.0) % 360.0 - 180.0

        return jnp.stack([pcx, pcy, pw, ph, pa], axis=-1).reshape(shape)


class Box2BoxTransformLinear:
    """Linear (distance-to-edges) parameterization used by anchor-free
    detectors like FCOS (reference box_regression.py:233-300)."""

    def __init__(self, normalize_by_size: bool = True):
        self.normalize_by_size = normalize_by_size

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """src_boxes are used only for their center points."""
        src_cx = 0.5 * (src_boxes[..., 0] + src_boxes[..., 2])
        src_cy = 0.5 * (src_boxes[..., 1] + src_boxes[..., 3])
        target_l = src_cx - target_boxes[..., 0]
        target_t = src_cy - target_boxes[..., 1]
        target_r = target_boxes[..., 2] - src_cx
        target_b = target_boxes[..., 3] - src_cy
        deltas = jnp.stack([target_l, target_t, target_r, target_b], axis=-1)
        if self.normalize_by_size:
            stride_w = src_boxes[..., 2] - src_boxes[..., 0]
            stride_h = src_boxes[..., 3] - src_boxes[..., 1]
            strides = jnp.stack([stride_w, stride_h, stride_w, stride_h], axis=-1)
            deltas = deltas / jnp.maximum(strides, 1e-6)
        return deltas

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        deltas = jax.nn.relu(deltas)  # negative sizes make no sense
        boxes = boxes.astype(deltas.dtype)
        ctr_x = 0.5 * (boxes[..., 0] + boxes[..., 2])
        ctr_y = 0.5 * (boxes[..., 1] + boxes[..., 3])

        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 4))
        if self.normalize_by_size:
            stride_w = (boxes[..., 2] - boxes[..., 0])[..., None]
            stride_h = (boxes[..., 3] - boxes[..., 1])[..., None]
            d = jnp.stack(
                [d[..., 0] * stride_w, d[..., 1] * stride_h, d[..., 2] * stride_w, d[..., 3] * stride_h],
                axis=-1,
            )

        out = jnp.stack(
            [
                ctr_x[..., None] - d[..., 0],
                ctr_y[..., None] - d[..., 1],
                ctr_x[..., None] + d[..., 2],
                ctr_y[..., None] + d[..., 3],
            ],
            axis=-1,
        )
        return out.reshape(shape)


def _dense_box_regression_loss(
    anchors: jnp.ndarray,
    box2box_transform,
    pred_anchor_deltas: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    fg_mask: jnp.ndarray,
    box_reg_loss_type: str = "smooth_l1",
    smooth_l1_beta: float = 0.0,
) -> jnp.ndarray:
    """Dense regression loss over foreground positions, mask-reduced
    (reference box_regression.py:305-365, reformulated from index-select to
    masked-sum for fixed shapes).

    Args:
        anchors: [..., 4]
        pred_anchor_deltas: [..., 4]
        gt_boxes: [..., 4] matched gt per anchor
        fg_mask: [...] bool — anchors that contribute

    Returns:
        scalar sum of the loss over foreground anchors.
    """
    fg = fg_mask.astype(jnp.float32)
    if box_reg_loss_type == "smooth_l1":
        gt_deltas = box2box_transform.get_deltas(anchors, gt_boxes)
        loss = smooth_l1_loss(pred_anchor_deltas, jax.lax.stop_gradient(gt_deltas), beta=smooth_l1_beta)
        return (loss.sum(axis=-1) * fg).sum()
    elif box_reg_loss_type == "giou":
        pred_boxes = box2box_transform.apply_deltas(pred_anchor_deltas, anchors)
        return (giou_loss(pred_boxes, gt_boxes) * fg).sum()
    elif box_reg_loss_type == "diou":
        pred_boxes = box2box_transform.apply_deltas(pred_anchor_deltas, anchors)
        return (diou_loss(pred_boxes, gt_boxes) * fg).sum()
    elif box_reg_loss_type == "ciou":
        pred_boxes = box2box_transform.apply_deltas(pred_anchor_deltas, anchors)
        return (ciou_loss(pred_boxes, gt_boxes) * fg).sum()
    else:
        raise ValueError(f"Invalid dense box regression loss type '{box_reg_loss_type}'")
