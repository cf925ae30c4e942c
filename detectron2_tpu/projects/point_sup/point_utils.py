"""Point-annotation utilities
(reference projects/PointSup/point_sup/point_utils.py).

``get_point_coords_from_point_annotation`` maps each proposal's matched gt
point annotations into the proposal-box frame — the fixed-shape analogue of
the reference's per-instance list processing: every instance always carries P
point slots, padded with label -1.
"""

import jax.numpy as jnp

__all__ = ["get_point_coords_from_point_annotation"]


def get_point_coords_from_point_annotation(
    proposal_boxes: jnp.ndarray,  # [R, 4] absolute xyxy
    gt_point_coords: jnp.ndarray,  # [R, P, 2] absolute xy of the matched gt
    gt_point_labels: jnp.ndarray,  # [R, P] {1, 0, -1}
):
    """Returns (coords [R, P, 2] box-relative in [0,1], labels [R, P] {0,1},
    weights [R, P] — 0 for pad/ignore and for points outside the proposal)."""
    x0, y0, x1, y1 = (proposal_boxes[:, i] for i in range(4))
    w = jnp.maximum(x1 - x0, 1e-4)[:, None]
    h = jnp.maximum(y1 - y0, 1e-4)[:, None]
    cx = (gt_point_coords[..., 0] - x0[:, None]) / w
    cy = (gt_point_coords[..., 1] - y0[:, None]) / h
    inside = (cx >= 0) & (cx <= 1) & (cy >= 0) & (cy <= 1)
    weights = ((gt_point_labels >= 0) & inside).astype(jnp.float32)
    coords = jnp.stack([jnp.clip(cx, 0.0, 1.0), jnp.clip(cy, 0.0, 1.0)], axis=-1)
    labels = jnp.maximum(gt_point_labels, 0).astype(jnp.float32)
    return coords, labels, weights
