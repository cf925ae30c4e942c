"""In-graph, fixed-shape non-maximum suppression for TPU.

Replaces torchvision's CUDA NMS used by the reference
(detectron2/layers/nms.py:11-22 wraps torchvision.ops.boxes.batched_nms).

Design: exact greedy NMS, reformulated as a tiled matrix algorithm so it maps
onto the TPU's vector unit with O(num_tiles^2) big vector ops instead of O(K)
tiny sequential steps:

1. Sort boxes by score (stable, so ties break by original index like
   torchvision).
2. Process tiles of T boxes in score order. Each tile is first suppressed by
   all *surviving* boxes of earlier tiles (one [T, T] IoU per earlier tile —
   pure data-parallel), then self-suppressed with a Jacobi fixed-point
   iteration of the greedy recurrence (converges in at most the suppression
   chain depth; a `lax.while_loop` runs it to the exact fixed point).
3. Suppressed boxes are zeroed (so they can never suppress others — zero-area
   boxes have IoU 0 with everything, making padding rows inert), while
   survival itself is tracked by an explicit alive mask, so VALID zero-area
   boxes are kept exactly like torchvision NMS keeps them.

The result is bit-identical to sequential greedy NMS. All shapes are static;
everything vmaps over leading batch dims.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["nms_padded", "batched_nms_padded", "nms", "batched_nms"]


def _pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def _self_suppress_tile(tile_boxes: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Exact greedy suppression within one score-sorted tile.

    alive_k = not exists j < k with alive_j and iou(j, k) > t.
    Jacobi-iterate this recurrence to its (unique, well-founded) fixed point.
    """
    T = tile_boxes.shape[0]
    iou = _pairwise_iou_xyxy(tile_boxes, tile_boxes)
    # edge[j, k] = True if j (higher score, j<k) suppresses k when j is alive
    tri = jnp.tril(jnp.ones((T, T), dtype=bool), k=-1).T  # [j, k] upper-strict: j < k
    edge = (iou > iou_threshold) & tri

    def cond(state):
        alive, prev_alive, it = state
        return jnp.logical_and(jnp.any(alive != prev_alive), it < T)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(edge & alive[:, None], axis=0)
        return (~suppressed, alive, it + 1)

    init_alive = jnp.ones((T,), dtype=bool)
    # one iteration first so cond sees a change signal
    suppressed = jnp.any(edge & init_alive[:, None], axis=0)
    alive, _, _ = lax.while_loop(cond, body, (~suppressed, init_alive, jnp.int32(1)))
    return alive


def _nms_sorted(
    boxes_sorted: jnp.ndarray, alive_init: jnp.ndarray, iou_threshold: float, tile: int
) -> jnp.ndarray:
    """Greedy NMS on score-sorted boxes; invalid boxes must already be zeroed
    and marked dead in `alive_init`.

    Survival is tracked with an explicit alive mask (not inferred from box
    area), so valid zero-area boxes are kept like torchvision NMS keeps them
    (their IoU with everything is 0).

    Returns:
        alive: bool [K] in sorted order.
    """
    K = boxes_sorted.shape[0]
    assert K % tile == 0
    num_tiles = K // tile

    def row_step(i, state):
        boxes, alive = state  # [K, 4] with suppressed boxes zeroed; [K] bool

        row = lax.dynamic_slice(boxes, (i * tile, 0), (tile, 4))
        row_alive = lax.dynamic_slice(alive, (i * tile,), (tile,))

        def cross_step(j, carry):
            row, row_alive = carry
            col = lax.dynamic_slice(boxes, (j * tile, 0), (tile, 4))
            iou = _pairwise_iou_xyxy(row, col)  # [T(row), T(col)]
            killed = jnp.any(iou > iou_threshold, axis=1)
            row_alive = row_alive & ~killed
            return row * (~killed[:, None]).astype(row.dtype), row_alive

        row, row_alive = lax.fori_loop(0, i, cross_step, (row, row_alive))
        row_alive = row_alive & _self_suppress_tile(row, iou_threshold)
        row = row * row_alive[:, None].astype(row.dtype)
        boxes = lax.dynamic_update_slice(boxes, row, (i * tile, 0))
        alive = lax.dynamic_update_slice(alive, row_alive, (i * tile,))
        return boxes, alive

    _, alive = lax.fori_loop(0, num_tiles, row_step, (boxes_sorted, alive_init))
    return alive


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    tile: int = 512,
) -> jnp.ndarray:
    """Fixed-shape greedy NMS.

    Args:
        boxes: [K, 4] XYXY boxes (any order).
        scores: [K] scores; padding should carry -inf (or pass `valid`).
        iou_threshold: suppression threshold (suppress IoU > threshold,
            matching torchvision).
        valid: optional [K] bool mask of real boxes.
        tile: tile size for the tiled algorithm.

    Returns:
        keep: bool [K] in the ORIGINAL box order; True = kept by greedy NMS.
    """
    K = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)

    order = jnp.argsort(-scores, stable=True)
    boxes_sorted = boxes[order]
    valid_sorted = jnp.isfinite(scores[order])
    # zero out invalid boxes so they are inert
    boxes_sorted = boxes_sorted * valid_sorted[:, None].astype(boxes_sorted.dtype)

    t = min(tile, K)
    pad = (-K) % t
    alive_init = valid_sorted
    if pad:
        boxes_sorted = jnp.concatenate(
            [boxes_sorted, jnp.zeros((pad, 4), boxes_sorted.dtype)], axis=0
        )
        alive_init = jnp.concatenate([alive_init, jnp.zeros((pad,), bool)])
    alive_sorted = _nms_sorted(boxes_sorted, alive_init, iou_threshold, t)[:K]

    keep = jnp.zeros((K,), dtype=bool).at[order].set(alive_sorted)
    return keep


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    tile: int = 512,
) -> jnp.ndarray:
    """Class/level-batched fixed-shape NMS via the coordinate-offset trick
    (reference layers/nms.py:128-146): boxes of different `idxs` are shifted
    to disjoint regions so a single NMS never suppresses across groups.

    Returns:
        keep: bool [K] in the original order.
    """
    # Max coordinate over valid boxes only, so padding can't inflate offsets.
    if valid is not None:
        coord_src = jnp.where(valid[:, None], boxes, 0.0)
    else:
        coord_src = boxes
    max_coordinate = jnp.max(coord_src)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_padded(shifted, scores, iou_threshold, valid=valid, tile=tile)


def keep_top_k(
    scores: jnp.ndarray, keep: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select indices of the top-k kept entries by score (fixed output size).

    Returns:
        idx: int32 [k] indices into the input (arbitrary where invalid)
        valid: bool [k]
    """
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = lax.top_k(masked, k)
    return idx, jnp.isfinite(top_scores)


# ------------------------------------------------------------------ host API
def nms(boxes, scores, iou_threshold: float):
    """Dynamic-shape API parity with torchvision.ops.nms: returns kept indices
    sorted by decreasing score. Not jittable (data-dependent output size) —
    use :func:`nms_padded` inside compiled code."""
    import numpy as np

    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold))
    idx = np.nonzero(keep)[0]
    order = np.argsort(-np.asarray(scores)[idx], kind="stable")
    return jnp.asarray(idx[order])


def batched_nms(boxes, scores, idxs, iou_threshold: float):
    """Dynamic-shape API parity with the reference `batched_nms`
    (layers/nms.py:11). Not jittable — use :func:`batched_nms_padded`."""
    import numpy as np

    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    keep = np.asarray(
        batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), iou_threshold)
    )
    idx = np.nonzero(keep)[0]
    order = np.argsort(-np.asarray(scores)[idx], kind="stable")
    return jnp.asarray(idx[order])
