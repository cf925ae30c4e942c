"""Rotated RoIAlign (reference detectron2/layers/csrc/ROIAlignRotated/*,
python wrapper layers/roi_align_rotated.py:11-103).

Same gather formulation as ops.roi_align, with the sample grid rotated by the
box angle: box-local offsets are rotated by theta about the box center before
the bilinear lookup. Always 'aligned' (continuous-coordinate) semantics, like
the reference op.
"""

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["roi_align_rotated", "roi_align_rotated_multilevel"]


def _sample_coords(boxes: jnp.ndarray, ph: int, pw: int, s: int, spatial_scale):
    """Rotated sample coordinates.

    Args:
        boxes: [R, 5] (cx, cy, w, h, angle_deg) in image coords.
        spatial_scale: scalar or [R] per-roi scale.
    Returns:
        ys, xs: [R, ph*s, pw*s] feature-space coordinates.
    """
    R = boxes.shape[0]
    scale = jnp.asarray(spatial_scale, jnp.float32)
    scale = jnp.broadcast_to(scale, (R,))
    cx = boxes[:, 0] * scale - 0.5
    cy = boxes[:, 1] * scale - 0.5
    w = boxes[:, 2] * scale
    h = boxes[:, 3] * scale
    theta = boxes[:, 4] * (jnp.pi / 180.0)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)

    bin_h = h / ph
    bin_w = w / pw

    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ix = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # local offsets from the box center
    y_loc = ((py[:, None] + iy[None, :]).reshape(-1)[None, :] * bin_h[:, None]) - h[:, None] / 2  # [R, ph*s]
    x_loc = ((px[:, None] + ix[None, :]).reshape(-1)[None, :] * bin_w[:, None]) - w[:, None] / 2  # [R, pw*s]

    # rotate: [R, ph*s, pw*s]
    xs = cx[:, None, None] + x_loc[:, None, :] * cos_t[:, None, None] - y_loc[:, :, None] * sin_t[:, None, None]
    ys = cy[:, None, None] + x_loc[:, None, :] * sin_t[:, None, None] + y_loc[:, :, None] * cos_t[:, None, None]
    return ys, xs


def _bilinear_gather(flat, base, ys, xs, H, W, C):
    """Bilinear sample [R, n, m] coordinates from flattened features.
    H, W may be scalars or [R] arrays."""
    R, n, m = ys.shape
    Hf = jnp.broadcast_to(jnp.asarray(H, jnp.float32), (R,))[:, None, None]
    Wf = jnp.broadcast_to(jnp.asarray(W, jnp.float32), (R,))[:, None, None]
    Hi = Hf.astype(jnp.int32)
    Wi = Wf.astype(jnp.int32)

    inside = (ys >= -1.0) & (ys <= Hf) & (xs >= -1.0) & (xs <= Wf)
    y = jnp.clip(ys, 0.0, Hf - 1)
    x = jnp.clip(xs, 0.0, Wf - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, Hi - 1)
    x1i = jnp.minimum(x0i + 1, Wi - 1)

    def g(yi, xi):
        idx = base[:, None, None] + yi * Wi + xi
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(R, n, m, C)

    val = (
        g(y0i, x0i) * ((1 - fy) * (1 - fx))[..., None]
        + g(y0i, x1i) * ((1 - fy) * fx)[..., None]
        + g(y1i, x0i) * (fy * (1 - fx))[..., None]
        + g(y1i, x1i) * (fy * fx)[..., None]
    )
    return jnp.where(inside[..., None], val, 0.0)


def roi_align_rotated(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    output_size: Union[int, Tuple[int, int]],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
) -> jnp.ndarray:
    """[B, H, W, C] x [R, 5] -> [R, ph, pw, C]."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2
    B, H, W, C = features.shape
    R = boxes.shape[0]
    dtype = features.dtype

    ys, xs = _sample_coords(boxes.astype(jnp.float32), ph, pw, s, spatial_scale)
    flat = features.reshape(B * H * W, C)
    base = batch_indices.astype(jnp.int32) * (H * W)
    val = _bilinear_gather(flat, base, ys, xs, H, W, C)
    val = val.reshape(R, ph, s, pw, s, C)
    return val.mean(axis=(2, 4)).astype(dtype)


def roi_align_rotated_multilevel(
    features: List[jnp.ndarray],
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    scales: Tuple[float, ...],
    output_size: Union[int, Tuple[int, int]],
    sampling_ratio: int = 0,
) -> jnp.ndarray:
    """Multi-level rotated pooling with FPN level assignment by sqrt(area)
    (the rotated ROIPooler; reference modeling/poolers.py handles rotated
    boxes identically)."""
    import math

    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2

    min_level = -int(math.log2(scales[0]))
    max_level = -int(math.log2(scales[-1]))

    area = jnp.clip(boxes[:, 2] * boxes[:, 3], 1e-8, None)
    level = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224 + 1e-8))
    level = (jnp.clip(level, min_level, max_level) - min_level).astype(jnp.int32)

    B = features[0].shape[0]
    C = features[0].shape[-1]
    dtype = features[0].dtype
    R = boxes.shape[0]

    flat_parts, bases, hs, ws = [], [], [], []
    off = 0
    for f in features:
        _, H, W, _ = f.shape
        flat_parts.append(f.reshape(B * H * W, C))
        bases.append(off)
        hs.append(H)
        ws.append(W)
        off += B * H * W
    flat = jnp.concatenate(flat_parts, axis=0)

    bases_a = jnp.asarray(bases, jnp.int32)[level]
    hs_a = jnp.asarray(hs, jnp.int32)[level]
    ws_a = jnp.asarray(ws, jnp.int32)[level]
    scale_a = jnp.asarray(scales, jnp.float32)[level]
    base = bases_a + batch_indices.astype(jnp.int32) * hs_a * ws_a

    ys, xs = _sample_coords(boxes.astype(jnp.float32), ph, pw, s, scale_a)
    val = _bilinear_gather(flat, base, ys, xs, hs_a, ws_a, C)
    val = val.reshape(R, ph, s, pw, s, C)
    return val.mean(axis=(2, 4)).astype(dtype)
