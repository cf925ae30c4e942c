"""Rotated-box geometry on TPU: pairwise IoU and rotated NMS.

Replaces the reference's CUDA/C++ rotated ops
(detectron2/layers/csrc/box_iou_rotated/box_iou_rotated_utils.h — polygon-clip
intersection math; csrc/nms_rotated/). Re-designed as fully vectorized jax:

Intersection area of two rotated rectangles = area of the convex polygon whose
vertices are (a) the 16 candidate edge-pair intersection points and (b) each
rectangle's corners inside the other (8 candidates). All 24 candidates are
computed with validity masks, centered on the valid-centroid, angle-sorted,
and shoelace-summed — no data-dependent shapes, so everything vmaps into an
[N, M] pairwise kernel.
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["box_corners_rotated", "pairwise_iou_rotated", "nms_rotated_padded", "nms_rotated"]

_EPS = 1e-8


def box_corners_rotated(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners of (cx, cy, w, h, angle_degrees_ccw) boxes.

    Returns [..., 4, 2] corner coordinates in consistent (ccw in math frame)
    order.
    """
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    theta = a * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = w / 2.0
    dy = h / 2.0
    # local corner offsets, ccw
    ox = jnp.stack([-dx, dx, dx, -dx], axis=-1)  # [..., 4]
    oy = jnp.stack([-dy, -dy, dy, dy], axis=-1)
    # rotate (ccw in y-down image frame matches the reference convention for
    # IoU purposes: mirroring preserves pairwise intersection areas)
    x = cx[..., None] + c[..., None] * ox - s[..., None] * oy
    y = cy[..., None] + s[..., None] * ox + c[..., None] * oy
    return jnp.stack([x, y], axis=-1)


def _cross2(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (a[..., 1] - o[..., 1]) * (
        b[..., 0] - o[..., 0]
    )


def _rect_pair_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quadrilaterals given corners [4, 2]."""
    # --- candidate points 1: all 16 edge-pair intersections
    p1 = c1  # [4,2]
    p2 = jnp.roll(c1, -1, axis=0)
    q1 = c2
    q2 = jnp.roll(c2, -1, axis=0)

    d1 = (p2 - p1)[:, None, :]  # [4,1,2]
    d2 = (q2 - q1)[None, :, :]  # [1,4,2]
    delta = q1[None, :, :] - p1[:, None, :]  # [4,4,2]

    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # [4,4]
    t = (delta[..., 0] * d2[..., 1] - delta[..., 1] * d2[..., 0]) / jnp.where(
        jnp.abs(denom) > _EPS, denom, 1.0
    )
    u = (delta[..., 0] * d1[..., 1] - delta[..., 1] * d1[..., 0]) / jnp.where(
        jnp.abs(denom) > _EPS, denom, 1.0
    )
    inter_valid = (jnp.abs(denom) > _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    inter_pts = p1[:, None, :] + t[..., None] * d1  # [4,4,2]

    # --- candidate points 2: corners of each rect inside the other
    def corners_inside(pts, rect):
        # pts [4,2]; rect corners [4,2] (convex, consistent winding)
        a = rect
        b = jnp.roll(rect, -1, axis=0)
        # sign of cross product for each (edge, point)
        cr = _cross2(a[:, None, :], b[:, None, :], pts[None, :, :])  # [4 edges, 4 pts]
        inside = jnp.all(cr >= -1e-6, axis=0) | jnp.all(cr <= 1e-6, axis=0)
        return inside

    in1 = corners_inside(c1, c2)  # c1 corners inside rect2
    in2 = corners_inside(c2, c1)

    pts = jnp.concatenate([inter_pts.reshape(16, 2), c1, c2], axis=0)  # [24,2]
    valid = jnp.concatenate([inter_valid.reshape(16), in1, in2], axis=0)  # [24]

    num_valid = jnp.sum(valid)

    # centroid of valid points
    vf = valid.astype(jnp.float32)
    centroid = jnp.sum(pts * vf[:, None], axis=0) / jnp.maximum(num_valid, 1)

    rel = pts - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, 1e9)  # invalid points sort last
    order = jnp.argsort(ang)
    rel_sorted = rel[order]  # first num_valid entries are the hull vertices (convex ⇒ angle sort works)

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 >= num_valid, 0, idx + 1)
    nxt_pts = rel_sorted[nxt]
    cross = rel_sorted[:, 0] * nxt_pts[:, 1] - rel_sorted[:, 1] * nxt_pts[:, 0]
    cross = jnp.where(idx < num_valid, cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(num_valid >= 3, area, 0.0)


def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between all pairs of rotated boxes: [N, 5] x [M, 5] -> [N, M].

    Matches the semantics of the reference op ``detectron2.box_iou_rotated``
    (csrc/box_iou_rotated/): boxes are (cx, cy, w, h, angle in degrees).
    """
    boxes1 = jnp.asarray(boxes1, jnp.float32)
    boxes2 = jnp.asarray(boxes2, jnp.float32)
    c1 = box_corners_rotated(boxes1)  # [N,4,2]
    c2 = box_corners_rotated(boxes2)  # [M,4,2]
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]

    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _rect_pair_intersection_area(a, b))(c2)
    )(c1)  # [N, M]

    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def nms_rotated_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid=None,
) -> jnp.ndarray:
    """Fixed-shape greedy NMS on rotated boxes; returns a bool keep mask in the
    original order (analogue of ops.nms.nms_padded; the rotated IoU matrix is
    materialized once since rotated candidate sets are small)."""
    K = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores, stable=True)
    b = boxes[order]
    valid_sorted = jnp.isfinite(scores[order])
    b = b * valid_sorted[:, None]

    iou = pairwise_iou_rotated(b, b)
    tri = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)  # [j, k]: j<k
    edge = (iou > iou_threshold) & tri & valid_sorted[:, None] & valid_sorted[None, :]

    def cond(state):
        alive, prev, it = state
        return jnp.logical_and(jnp.any(alive != prev), it < K)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(edge & alive[:, None], axis=0)
        return (~suppressed & valid_sorted, alive, it + 1)

    init = valid_sorted
    suppressed = jnp.any(edge & init[:, None], axis=0)
    alive, _, _ = lax.while_loop(cond, body, (~suppressed & valid_sorted, init, jnp.int32(1)))

    keep = jnp.zeros((K,), dtype=bool).at[order].set(alive)
    return keep


def nms_rotated(boxes, scores, iou_threshold: float):
    """Dynamic-shape parity API (reference layers/nms.py:28): returns kept
    indices sorted by score. Host-side only."""
    import numpy as np

    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    keep = np.asarray(nms_rotated_padded(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold))
    idx = np.nonzero(keep)[0]
    order = np.argsort(-np.asarray(scores)[idx], kind="stable")
    return jnp.asarray(idx[order])
