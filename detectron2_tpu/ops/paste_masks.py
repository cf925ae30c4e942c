"""Paste ROI masks into full-image masks — MXU-separable formulation.

Replaces the reference's grid_sample-based ``paste_masks_in_image``
(detectron2/layers/mask_ops.py:17-147, chunked under a 1GB GPU cap).

TPU-native design: bilinear resampling of an M x M roi mask onto the H x W
image grid is *separable*, so the paste becomes two dense matmuls per
instance:

    out[n] = Wy[n] @ mask[n] @ Wx[n]^T      Wy: [H, M], Wx: [W, M]

which runs on the MXU instead of a gather. The interpolation matrices encode
grid_sample's align_corners=False + zero-padding semantics, so results match
the reference bit-for-bit at the 0.5 threshold (up to float associativity).
Instances are processed in fixed-size chunks with ``lax.map`` to bound the
[chunk, H, W] transient.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["paste_masks_in_image", "paste_masks_probs"]


def _interp_matrix(starts: jnp.ndarray, ends: jnp.ndarray, out_size: int, mask_size: int) -> jnp.ndarray:
    """Build per-instance bilinear sampling matrices.

    For output pixel index i (center i + 0.5) of a box [start, end), the
    source coordinate in the roi mask is
        p = (i + 0.5 - start) / (end - start) * M - 0.5
    (the grid_sample align_corners=False mapping used at reference
    mask_ops.py:40-60). Out-of-range samples get zero weight (zero padding).

    Args:
        starts, ends: [N] box edges in image coords.
        out_size: H or W.
        mask_size: M.
    Returns:
        [N, out_size, mask_size] float32 weights.
    """
    N = starts.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # [1, out]
    length = jnp.maximum(ends - starts, 1e-4)[:, None]  # [N, 1]
    p = (i + 0.5 - starts[:, None]) / length * mask_size - 0.5  # [N, out]

    m0 = jnp.floor(p)
    frac = p - m0
    m0i = m0.astype(jnp.int32)
    m1i = m0i + 1

    w0 = (1.0 - frac) * ((m0i >= 0) & (m0i < mask_size))
    w1 = frac * ((m1i >= 0) & (m1i < mask_size))

    oh0 = jax.nn.one_hot(jnp.clip(m0i, 0, mask_size - 1), mask_size, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(jnp.clip(m1i, 0, mask_size - 1), mask_size, dtype=jnp.float32)
    return oh0 * w0[..., None] + oh1 * w1[..., None]  # [N, out, M]


def _paste_chunked(masks, boxes, H, W, chunk, postprocess, fast: bool = False):
    """Shared chunked driver: lax.map over fixed-size instance chunks, with
    `postprocess` applied INSIDE the scan body so only its (small-dtype)
    result is materialized for the whole set — pasting a full batch in f32
    would be gigabytes of HBM.

    fast=False: both matmuls run fp32 HIGHEST (exact probabilities).
    fast=True: the large [H,M]x[M,W] resample runs with bf16 operands and
    f32 accumulation (~8x MXU rate). Relative error ~2^-8 only moves the
    0.5-threshold contour by <=1px on the thin ring of non-saturated pixels —
    use it when the result is binarized (the reference's own fp16 inference
    pastes coarser than this, mask_ops.py:17-69).
    """
    N, M, _ = masks.shape
    boxes = boxes.astype(jnp.float32)
    masks = masks.astype(jnp.float32)

    pad = (-N) % chunk
    if pad:
        masks = jnp.concatenate([masks, jnp.zeros((pad, M, M), masks.dtype)], 0)
        boxes = jnp.concatenate([boxes, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (pad, 1))], 0)
    n_chunks = masks.shape[0] // chunk

    def paste_chunk(args):
        m, b = args  # [chunk, M, M], [chunk, 4]
        wy = _interp_matrix(b[:, 1], b[:, 3], H, M)  # [chunk, H, M]
        wx = _interp_matrix(b[:, 0], b[:, 2], W, M)  # [chunk, W, M]
        # the y-blend is tiny (H*M*M) — always exact
        tmp = jnp.einsum(
            "nhm,nmk->nhk", wy, m, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
        )
        if fast:
            probs = jnp.einsum(
                "nhk,nwk->nhw",
                tmp.astype(jnp.bfloat16),
                wx.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            probs = jnp.einsum(
                "nhk,nwk->nhw", tmp, wx, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
            )
        return postprocess(probs)

    out = lax.map(
        paste_chunk,
        (masks.reshape(n_chunks, chunk, M, M), boxes.reshape(n_chunks, chunk, 4)),
    )
    return out.reshape(-1, H, W)[:N]


def paste_masks_probs(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_shape: Tuple[int, int],
    chunk: int = 8,
) -> jnp.ndarray:
    """Paste mask probabilities; returns float [N, H, W]."""
    H, W = int(image_shape[0]), int(image_shape[1])
    N = masks.shape[0]
    if N == 0:
        return jnp.zeros((0, H, W), dtype=jnp.float32)
    return _paste_chunked(masks, boxes, H, W, chunk, lambda p: p)


def paste_masks_in_image(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_shape: Tuple[int, int],
    threshold: float = 0.5,
    chunk: int = 8,
    fast: bool = False,
) -> jnp.ndarray:
    """Paste a set of roi masks (probabilities) into an image-size boolean mask.

    Args:
        masks: [N, M, M] mask probabilities in [0, 1].
        boxes: [N, 4] boxes in image coordinates.
        image_shape: (H, W).
        threshold: binarize with ``>= threshold`` (reference mask_ops.py:120).

    Returns:
        bool [N, H, W].
    """
    H, W = int(image_shape[0]), int(image_shape[1])
    N = masks.shape[0]
    if N == 0:
        return jnp.zeros((0, H, W), dtype=bool)
    # binarize inside the chunk loop: the f32 probabilities for the full set
    # are never materialized (8x less HBM than probs-then-threshold)
    return _paste_chunked(masks, boxes, H, W, chunk, lambda p: p >= threshold, fast=fast)
