"""Point sampling primitives
(reference projects/PointRend/point_rend/point_features.py).

The reference builds on ``F.grid_sample``; here ``point_sample`` is an
explicit 4-tap bilinear gather (align_corners=False pixel-center convention,
zeros-padded out of bounds exactly like torch grid_sample's default), which
XLA lowers to a handful of fused gathers — the point counts are small and
static, so this never touches the RoIAlign hot path.
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "point_sample",
    "point_sample_fine_grained_features",
    "generate_regular_grid_point_coords",
    "get_uncertain_point_coords_with_randomness",
    "get_uncertain_point_coords_on_grid",
    "get_point_coords_wrt_image",
]


def point_sample(x: jnp.ndarray, coords: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Sample per-roi feature maps at normalized points.

    Args:
        x: [R, H, W, C] feature maps.
        coords: [R, P, 2] (x, y) in [0, 1] (align_corners=False convention:
            pixel i's center is at (i + 0.5) / size).
        mode: "bilinear" or "nearest" (for integer label maps).
    Returns:
        [R, P, C] sampled values.
    """
    R, H, W, C = x.shape
    px = coords[..., 0].astype(jnp.float32) * W - 0.5
    py = coords[..., 1].astype(jnp.float32) * H - 0.5
    if mode == "nearest":
        yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        return jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi, xi)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def tap(yi, xi):
        # torch grid_sample padding_mode="zeros": out-of-range taps are 0
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        v = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi, xi)  # [R, P, C]
        return v * inb[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def generate_regular_grid_point_coords(R: int, side_size: int) -> jnp.ndarray:
    """Regular cell-center grid in [0,1]^2, one per region
    (reference point_features.py:generate_regular_grid_point_coords —
    affine_grid with align_corners=False lands on (i + 0.5) / side).

    Returns [R, side*side, 2] (x, y), x fastest."""
    c = (jnp.arange(side_size, dtype=jnp.float32) + 0.5) / side_size
    xs, ys = jnp.meshgrid(c, c, indexing="xy")
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # [side^2, 2]
    return jnp.broadcast_to(grid[None], (R, side_size * side_size, 2))


def get_point_coords_wrt_image(boxes: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Box-relative [0,1] points -> absolute image coordinates
    (reference point_features.py get_point_coords_wrt_image)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    w = (x1 - x0)[:, None]
    h = (y1 - y0)[:, None]
    ax = coords[..., 0] * w + x0[:, None]
    ay = coords[..., 1] * h + y0[:, None]
    return jnp.stack([ax, ay], axis=-1)


def point_sample_fine_grained_features(
    features: Sequence[jnp.ndarray],  # each [B, Hl, Wl, C]
    scales: Sequence[float],  # 1 / stride per level
    boxes: jnp.ndarray,  # [R, 4] absolute image coords
    batch_idx: jnp.ndarray,  # [R] int
    coords: jnp.ndarray,  # [R, P, 2] box-relative in [0,1]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample per-point features from image-level maps
    (reference point_features.py point_sample_fine_grained_features).

    Returns ([R, P, sum C], [R, P, 2] image-absolute coords).
    """
    abs_coords = get_point_coords_wrt_image(boxes, coords)
    outs = []
    for feat, scale in zip(features, scales):
        B, H, W, C = feat.shape
        # absolute image point -> this level's pixel frame -> normalized
        nx = abs_coords[..., 0] * scale / W
        ny = abs_coords[..., 1] * scale / H

        px = nx * W - 0.5
        py = ny * H - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = (px - x0)[..., None]
        wy = (py - y0)[..., None]

        def tap(yi, xi):
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
            xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
            b = batch_idx[:, None].astype(jnp.int32)
            return feat[b, yi, xi] * inb[..., None]  # [R, P, C] gather, zero-padded

        v = (
            tap(y0, x0) * (1 - wy) * (1 - wx)
            + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx)
            + tap(y0 + 1, x0 + 1) * wy * wx
        )
        outs.append(v)
    return jnp.concatenate(outs, axis=-1), abs_coords


def _uncertainty(logits: jnp.ndarray, classes: jnp.ndarray) -> jnp.ndarray:
    """-|logit of the (gt or predicted) class|: most uncertain near 0
    (reference mask_head.py calculate_uncertainty)."""
    C = logits.shape[-1]
    if C == 1:
        sel = logits[..., 0]
    else:
        cls = jnp.clip(classes, 0, C - 1).astype(jnp.int32)
        sel = jnp.take_along_axis(logits, cls[:, None, None], axis=-1)[..., 0]
    return -jnp.abs(sel)


def get_uncertain_point_coords_with_randomness(
    rng,
    coarse_logits: jnp.ndarray,  # [R, h, w, C]
    classes: jnp.ndarray,  # [R]
    num_points: int,
    oversample_ratio: int = 3,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Training-time point selection: oversample k*N random points, keep the
    βN most uncertain, fill with (1-β)N fresh random points
    (reference point_features.py:get_uncertain_point_coords_with_randomness).
    All counts static. Returns [R, N, 2] box-relative coords."""
    R = coarse_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    cand = jax.random.uniform(k1, (R, n_sampled, 2))
    # uncertainty of the coarse prediction at each candidate
    logits_at = point_sample(coarse_logits, cand)  # [R, n, C]
    unc = _uncertainty(logits_at, classes)  # [R, n]

    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    _, idx = jax.lax.top_k(unc, n_unc)
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)  # [R, n_unc, 2]
    if n_rand > 0:
        extra = jax.random.uniform(k2, (R, n_rand, 2))
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked


def get_uncertain_point_coords_on_grid(
    uncertainty: jnp.ndarray,  # [R, H, W]
    num_points: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ``num_points`` most uncertain grid cells
    (reference point_features.py:get_uncertain_point_coords_on_grid).

    Returns (flat indices [R, N], coords [R, N, 2] normalized)."""
    R, H, W = uncertainty.shape
    flat = uncertainty.reshape(R, H * W)
    num_points = min(num_points, H * W)
    _, idx = jax.lax.top_k(flat, num_points)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    coords = jnp.stack([(xs + 0.5) / W, (ys + 0.5) / H], axis=-1)
    return idx, coords
