"""RoIAlign for TPU — XLA gather formulation (Pallas kernel variant lives in
ops/pallas/roi_align.py once profiled in).

Semantics follow the reference's ROIAlign with ``aligned=True`` ("ROIAlignV2",
the half-pixel correction described at reference detectron2/layers/roi_align.py:18-35):

- continuous coordinate c maps to pixel index c - 0.5;
- each output bin averages ``sampling_ratio**2`` bilinear samples placed on a
  regular sub-grid of the bin.

One deliberate fixed-shape divergence: the reference's ``sampling_ratio=0``
means an adaptive per-roi ``ceil(roi_size / output_size)`` sample count, which
is data-dependent and cannot be compiled statically. Here ``sampling_ratio=0``
selects a static 2x2 sub-grid — the standard TPU detection formulation; the
numerical difference only appears for rois far from their FPN level's
canonical scale.

Layout: features are NHWC (channels-last → TPU lanes).
"""

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["roi_align", "roi_align_multilevel"]


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    output_size: Union[int, Tuple[int, int]],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """Region-of-interest align.

    Args:
        features: [B, H, W, C] feature map.
        boxes: [R, 4] XYXY boxes in the *input image* coordinate frame
            (they are multiplied by spatial_scale, like the reference op).
        batch_indices: [R] int — which image each roi comes from.
        output_size: (ph, pw) of the pooled output.
        spatial_scale: scale to map box coords to feature coords (1/stride).
        sampling_ratio: samples per bin side; 0 → static 2 (see module doc).
        aligned: half-pixel correction (ROIAlignV2). aligned=False reproduces
            the original Detectron1 grid.

    Returns:
        [R, ph, pw, C] pooled features.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2

    B, H, W, C = features.shape
    R = boxes.shape[0]
    dtype = features.dtype
    boxes = boxes.astype(jnp.float32)

    offset = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] * spatial_scale - offset
    y0 = boxes[:, 1] * spatial_scale - offset
    x1 = boxes[:, 2] * spatial_scale - offset
    y1 = boxes[:, 3] * spatial_scale - offset

    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:  # legacy mode clamps tiny rois to 1x1 (torchvision parity)
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_h = roi_h / ph  # [R]
    bin_w = roi_w / pw

    # Sample grid: for bin (py, px), sample (iy, ix) at
    #   y = y0 + (py + (iy + 0.5) / s) * bin_h
    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ix = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # [R, ph, s]
    ys = y0[:, None, None] + (py[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]
    # [R, pw, s]
    xs = x0[:, None, None] + (px[None, :, None] + ix[None, None, :]) * bin_w[:, None, None]

    ys = ys.reshape(R, ph * s)  # all sample rows
    xs = xs.reshape(R, pw * s)  # all sample cols

    # Bilinear interpolation weights. Out-of-range samples contribute 0
    # (matching the reference kernel which skips y < -1 or y > H).
    def _prep(coords, size):
        inside = (coords >= -1.0) & (coords <= size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return lo, hi, frac, inside

    ylo, yhi, yfrac, yin = _prep(ys, H)  # [R, ph*s]
    xlo, xhi, xfrac, xin = _prep(xs, W)  # [R, pw*s]

    flat = features.reshape(B * H * W, C)
    base = batch_indices.astype(jnp.int32) * (H * W)  # [R]

    # Chunk rois to bound the [chunk, ph*s, pw*s, C] transient in HBM
    # (8000 rois x 14x14 x 256ch in one shot is tens of GB).
    out = _chunked_bilinear_pool(
        flat, base, ylo, yhi, yfrac, yin, xlo, xhi, xfrac, xin, W, ph, pw, s, C, dtype
    )
    return out


def _chunked_bilinear_pool(
    flat, base, ylo, yhi, yfrac, yin, xlo, xhi, xfrac, xin, W, ph, pw, s, C, dtype, chunk=512
):
    """Shared gather+interpolate+bin-mean core, processed ``chunk`` rois at a
    time via lax.map. Interpolation runs in the feature dtype (bf16 on TPU)."""
    from jax import lax

    R = base.shape[0]
    # W may be a scalar (single-level) or per-roi array (multi-level)
    W_per_roi = jnp.broadcast_to(jnp.asarray(W, jnp.int32), (R,))
    n = min(chunk, R)
    pad = (-R) % n
    if pad:
        padded = lambda a, fill=0: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        base = padded(base)
        ylo, yhi, xlo, xhi = padded(ylo), padded(yhi), padded(xlo), padded(xhi)
        yfrac, xfrac = padded(yfrac), padded(xfrac)
        yin, xin = padded(yin, False), padded(xin, False)
        W_per_roi = padded(W_per_roi, 1)
    n_chunks = base.shape[0] // n

    def reshape_c(a):
        return a.reshape((n_chunks, n) + a.shape[1:])

    def pool_chunk(args):
        cbase, cylo, cyhi, cyf, cyin, cxlo, cxhi, cxf, cxin, cW = args

        def gather(yi, xi):
            idx = cbase[:, None, None] + yi[:, :, None] * cW[:, None, None] + xi[:, None, :]
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(n, ph * s, pw * s, C)

        wy1 = cyf[:, :, None, None].astype(flat.dtype)
        wy0 = 1.0 - wy1
        wx1 = cxf[:, None, :, None].astype(flat.dtype)
        wx0 = 1.0 - wx1

        val = (
            gather(cylo, cxlo) * (wy0 * wx0)
            + gather(cylo, cxhi) * (wy0 * wx1)
            + gather(cyhi, cxlo) * (wy1 * wx0)
            + gather(cyhi, cxhi) * (wy1 * wx1)
        )
        inside = (cyin[:, :, None] & cxin[:, None, :])[..., None]
        val = jnp.where(inside, val, 0)
        val = val.reshape(n, ph, s, pw, s, C)
        return val.astype(jnp.float32).mean(axis=(2, 4))

    out = lax.map(
        pool_chunk,
        tuple(
            reshape_c(a)
            for a in (base, ylo, yhi, yfrac, yin, xlo, xhi, xfrac, xin, W_per_roi)
        ),
    )
    out = out.reshape(-1, ph, pw, C)[:R]
    return out.astype(dtype)


def roi_align_separable(
    maps: jnp.ndarray,
    boxes: jnp.ndarray,
    src_indices: jnp.ndarray,
    output_size,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoIAlign over a stack of small single-channel maps as two batched
    matmuls instead of a point gather.

    Bilinear interpolation is separable, so pooling roi ``r`` from
    ``maps[src_indices[r]]`` is ``mean_pool_s(Wy[r] @ map @ Wx[r]^T)`` with
    ``Wy [ph*s, Hm]`` / ``Wx [pw*s, Wm]`` holding the row/col sample weights
    (relu(1-|y-m|) on clipped coords, zeroed outside the (-1, size) border —
    exactly the neighbor weights of :func:`roi_align`). Same sample
    coordinates, same border rule, same bin mean; only the summation order
    differs (row-interp then col-interp), so results match :func:`roi_align`
    to float rounding.

    This is the right formulation for the mask-loss GT crop (per-proposal
    28x28 crops of per-gt mask rasters): the gather formulation spends
    ~26% of the whole Mask R-CNN train step in scalar-ish gathers over
    [G, 28, 28, 1] tensors (profile_breakdown, v5e, batch 8), while these
    einsums run on the MXU. There is no spatial_scale: ``boxes`` are already
    in map pixel coordinates.

    Args:
        maps: [N, Hm, Wm] single-channel stack.
        boxes: [R, 4] XYXY in map coordinates.
        src_indices: [R] int — which map each roi samples.
        output_size: (ph, pw).
    Returns:
        [R, ph, pw] pooled values (float32).
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2
    N, Hm, Wm = maps.shape
    R = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)

    offset = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] - offset
    y0 = boxes[:, 1] - offset
    roi_w = boxes[:, 2] - boxes[:, 0]
    roi_h = boxes[:, 3] - boxes[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    def sample_coords(lo, extent, n_bins):
        grid = (
            jnp.arange(n_bins, dtype=jnp.float32)[None, :, None]
            + ((jnp.arange(s, dtype=jnp.float32) + 0.5) / s)[None, None, :]
        )
        return (lo[:, None, None] + grid * (extent / n_bins)[:, None, None]).reshape(R, n_bins * s)

    def weights(coords, size):
        # [R, n, size] bilinear row/col weights with the gather kernel's
        # border semantics: clip into [0, size-1], zero outside (-1, size)
        inside = (coords >= -1.0) & (coords <= size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        m = jnp.arange(size, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - m))
        return w * inside[..., None].astype(jnp.float32)

    wy = weights(sample_coords(y0, roi_h, ph), Hm)  # [R, ph*s, Hm]
    wx = weights(sample_coords(x0, roi_w, pw), Wm)  # [R, pw*s, Wm]

    sel = maps.astype(jnp.float32)[src_indices.astype(jnp.int32)]  # [R, Hm, Wm]
    rows = jnp.einsum("rym,rmx->ryx", wy, sel)  # [R, ph*s, Wm]
    grid = jnp.einsum("ryx,rwx->ryw", rows, wx)  # [R, ph*s, pw*s]
    return grid.reshape(R, ph, s, pw, s).mean(axis=(2, 4))


def roi_align_separable_chan(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """Separable-matmul RoIAlign over a multi-channel map, K rois per image.

    The big-footprint single-level pool: the DensePose head pools 28x28 crops
    from the stride-4 decoder map (reference densepose/modeling/roi_heads/
    roi_head.py:112-164), where person boxes span up to ~300 feature px —
    far beyond the Pallas kernel's DMA window, and the XLA gather formulation
    is the slow path the profile flagged. Bilinear interpolation is
    separable, so each crop is two batched MXU einsums,
    ``out = Wy_bin @ map @ Wx_bin^T``, with the s^2 bin mean FOLDED into the
    weight matrices (mean of samples = sum with averaged weights — bit-exact
    since interpolation is linear in the weights). Exact for every box size:
    no window, no edge-clamp approximation.

    Cost: 2*K*(ph*H*W + ph*pw*W)*C FLOPs per image — DensePose inference
    (K=24, 28x28, 200x336x256 map) is ~26 GFLOP/im on the MXU vs a ~1.2M
    point gather.

    Args:
        features: [B, H, W, C] map (single level).
        boxes: [B, K, 4] XYXY in image coordinates (equal rois per image).
        output_size: (ph, pw).
        spatial_scale: 1/stride mapping image to map coords.
        sampling_ratio: samples per bin side; 0 -> static 2.
        aligned: half-pixel (V2) vs legacy v1 grid (no offset, >=1x1 clamp).

    Returns:
        [B, K, ph, pw, C] in features.dtype.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2
    B, H, W, C = features.shape
    K = boxes.shape[1]
    R = B * K
    b = boxes.reshape(R, 4).astype(jnp.float32) * spatial_scale

    offset = 0.5 if aligned else 0.0
    x0 = b[:, 0] - offset
    y0 = b[:, 1] - offset
    roi_w = b[:, 2] - b[:, 0]
    roi_h = b[:, 3] - b[:, 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    def sample_coords(lo, extent, n_bins):
        grid = (
            jnp.arange(n_bins, dtype=jnp.float32)[None, :, None]
            + ((jnp.arange(s, dtype=jnp.float32) + 0.5) / s)[None, None, :]
        )
        return (lo[:, None, None] + grid * (extent / n_bins)[:, None, None]).reshape(
            R, n_bins * s
        )

    def weights(coords, size, n_bins):
        # [R, n_bins, size]: bilinear weights with the gather kernel's border
        # rule (clip into [0, size-1], zero outside (-1, size)), bin-meaned
        inside = (coords >= -1.0) & (coords <= size)
        c = jnp.clip(coords, 0.0, size - 1.0)
        m = jnp.arange(size, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - m))
        w = w * inside[..., None].astype(jnp.float32)
        return w.reshape(R, n_bins, s, size).mean(axis=2)

    wy = weights(sample_coords(y0, roi_h, ph), H, ph).reshape(B, K, ph, H)
    wx = weights(sample_coords(x0, roi_w, pw), W, pw).reshape(B, K, pw, W)

    dtype = features.dtype
    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    rows = jnp.einsum(
        "bkph,bhwc->bkpwc", wy, features, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "bkqw,bkpwc->bkpqc", wx, rows.astype(dtype), preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def roi_align_multilevel(
    features: dict,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    level_assignments: jnp.ndarray,
    level_order: Tuple[str, ...],
    scales: Tuple[float, ...],
    output_size: Union[int, Tuple[int, int]],
    sampling_ratio: int = 0,
    aligned: bool = True,
    use_pallas: str = "auto",
) -> jnp.ndarray:
    """Multi-level RoIAlign.

    On TPU (use_pallas="auto") the forward pass runs the Pallas DMA kernel
    (ops/pallas/roi_align_pallas.py) — the XLA gather formulation below lowers
    to row-wise dynamic slices that are ~30x slower on TPU — with this XLA
    formulation's autodiff as the backward pass. On CPU, and for gradients,
    the XLA path runs.
    """
    if use_pallas == "auto":
        import os

        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and os.environ.get("D2T_DISABLE_PALLAS", "0") != "1"
        )
    import os as _os

    if _os.environ.get("D2T_ROIALIGN_STOPGRAD", "0") == "1":
        # measurement-only flag: kills the pooler backward to quantify its
        # cost in the train step (NOT valid for real training)
        features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)
    if use_pallas:
        return _roi_align_ml_hybrid(
            features,
            boxes,
            batch_indices,
            level_assignments,
            level_order=tuple(level_order),
            scales=tuple(scales),
            output_size=output_size if isinstance(output_size, tuple) else (output_size, output_size),
            sampling_ratio=sampling_ratio,
            aligned=bool(aligned),
        )
    return _roi_align_multilevel_xla(
        features,
        boxes,
        batch_indices,
        level_assignments,
        level_order,
        scales,
        output_size,
        sampling_ratio,
        aligned,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def _roi_align_ml_hybrid(
    features, boxes, batch_indices, level_assignments, level_order, scales, output_size,
    sampling_ratio, aligned=True,
):
    from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_multilevel

    return roi_align_pallas_multilevel(
        features,
        boxes,
        batch_indices,
        level_assignments,
        level_order,
        scales,
        output_size,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )


def _roi_align_ml_hybrid_fwd(
    features, boxes, batch_indices, level_assignments, level_order, scales, output_size,
    sampling_ratio, aligned=True,
):
    out = _roi_align_ml_hybrid(
        features, boxes, batch_indices, level_assignments, level_order, scales, output_size,
        sampling_ratio, aligned,
    )
    return out, (features, boxes, batch_indices, level_assignments)


def _roi_align_ml_transpose(
    g,  # [R, ph, pw, C] cotangent
    features,  # pytree of [B, Hl, Wl, C] (shapes/dtypes only)
    boxes,
    batch_indices,
    level_assignments,
    level_order,
    scales,
    output_size,
    sampling_ratio,
    chunk: int = 512,
):
    """The explicit transpose of ``_roi_align_multilevel_xla``: each bin's
    cotangent is spread over its s*s samples (1/s^2 each) and scatter-added
    through the same 4-tap bilinear weights into the flattened level buffer.

    Hand-written (rather than jax.vjp of the forward) so the backward pays
    ONLY for the scatter — the vjp would also re-run the full gather forward,
    which dominates the Mask R-CNN train step."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2

    feats = [features[n] for n in level_order]
    B = feats[0].shape[0]
    C = feats[0].shape[-1]
    R = boxes.shape[0]

    level_bases, hs, ws = [], [], []
    base = 0
    for f in feats:
        _, H, W, _ = f.shape
        level_bases.append(base)
        hs.append(H)
        ws.append(W)
        base += B * H * W
    total_rows = base

    lvl = level_assignments.astype(jnp.int32)
    level_bases_a = jnp.asarray(level_bases, jnp.int32)
    hs_a = jnp.asarray(hs, jnp.int32)
    ws_a = jnp.asarray(ws, jnp.int32)
    scales_a = jnp.asarray(scales, jnp.float32)

    roi_scale = scales_a[lvl]
    roi_H = hs_a[lvl]
    roi_W = ws_a[lvl]
    roi_base = level_bases_a[lvl] + batch_indices.astype(jnp.int32) * roi_H * roi_W

    boxes = boxes.astype(jnp.float32)
    x0 = boxes[:, 0] * roi_scale - 0.5
    y0 = boxes[:, 1] * roi_scale - 0.5
    bin_h = (boxes[:, 3] * roi_scale - 0.5 - y0) / ph
    bin_w = (boxes[:, 2] * roi_scale - 0.5 - x0) / pw

    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = (y0[:, None, None] + (py[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]).reshape(R, ph * s)
    xs = (x0[:, None, None] + (px[None, :, None] + iy[None, None, :]) * bin_w[:, None, None]).reshape(R, pw * s)

    def _prep(coords, size):
        sizef = size.astype(jnp.float32)[:, None]
        inside = (coords >= -1.0) & (coords <= sizef)
        c = jnp.clip(coords, 0.0, sizef - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size[:, None] - 1)
        return lo, hi, frac, inside

    ylo, yhi, yfrac, yin = _prep(ys, roi_H)
    xlo, xhi, xfrac, xin = _prep(xs, roi_W)

    # cotangent per sample, f32 accumulation
    g_s = (g.astype(jnp.float32) / (s * s))  # [R, ph, pw, C]
    g_s = jnp.repeat(jnp.repeat(g_s, s, axis=1), s, axis=2)  # [R, ph*s, pw*s, C]

    n = min(chunk, R)
    pad = (-R) % n
    if pad:
        padz = lambda a, fill=0: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        roi_base = padz(roi_base)
        ylo, yhi, xlo, xhi = padz(ylo), padz(yhi), padz(xlo), padz(xhi)
        yfrac, xfrac = padz(yfrac), padz(xfrac)
        yin, xin = padz(yin, False), padz(xin, False)
        roi_W = padz(roi_W, 1)
        g_s = padz(g_s)
    n_chunks = roi_base.shape[0] // n

    def rc(a):
        return a.reshape((n_chunks, n) + a.shape[1:])

    xs_all = tuple(
        rc(a) for a in (roi_base, ylo, yhi, yfrac, yin, xlo, xhi, xfrac, xin, roi_W, g_s)
    )

    def body(acc, args):
        cbase, cylo, cyhi, cyf, cyin, cxlo, cxhi, cxf, cxin, cW, cg = args
        inside = (cyin[:, :, None] & cxin[:, None, :])[..., None]
        cg = jnp.where(inside, cg, 0.0)
        wy1 = cyf[:, :, None, None]
        wy0 = 1.0 - wy1
        wx1 = cxf[:, None, :, None]
        wx0 = 1.0 - wx1
        for yi, wy in ((cylo, wy0), (cyhi, wy1)):
            for xi, wx in ((cxlo, wx0), (cxhi, wx1)):
                idx = cbase[:, None, None] + yi[:, :, None] * cW[:, None, None] + xi[:, None, :]
                upd = (cg * (wy * wx)).reshape(-1, C)
                acc = acc.at[idx.reshape(-1)].add(upd)
        return acc, None

    acc = jnp.zeros((total_rows, C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, xs_all)

    out = {}
    base = 0
    for name, f in zip(level_order, feats):
        _, H, W, _ = f.shape
        cnt = B * H * W
        out[name] = acc[base : base + cnt].reshape(B, H, W, C).astype(f.dtype)
        base += cnt
    return out


def _roi_align_ml_transpose_window(
    g,  # [R, ph, pw, C] cotangent
    features,
    boxes,
    batch_indices,
    level_assignments,
    level_order,
    scales,
    output_size,
    sampling_ratio,
    chunk: int = 64,
    XW: int = 64,
    YH: int = 48,
):
    """Windowed transpose of the Pallas forward kernel — the production
    RoIAlign backward.

    The per-element scatter backward is UPDATE-COUNT bound on TPU (profiled:
    ~4.8M 256-wide scatter rows = ~330 ms/step, 76% of the Mask R-CNN train
    step). This formulation mirrors the forward kernel's clamped
    [YH, XW]-window geometry (ops/pallas/roi_align_pallas.py — the SAME
    ``_precompute``, so forward and backward are an exact adjoint pair,
    clamping included): each roi's dense [YH, XW, C] gradient window is two
    small MXU einsums, and the scatter shrinks to ONE window-add per roi
    (R ≈ 5k updates instead of 4.8M)."""
    from detectron2_tpu.ops.pallas.roi_align_pallas import _precompute

    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2

    feats = [features[n] for n in level_order]
    B, _, _, C = feats[0].shape
    R = boxes.shape[0]

    hs, ws, ws_true, row_bases = [], [], [], []
    rows_total = 0
    for f in feats:
        _, H, W, _ = f.shape
        Wp = max(((W + 7) // 8) * 8, XW)
        hs.append(H)
        ws.append(Wp)
        ws_true.append(W)
        row_bases.append(rows_total)
        rows_total += B * H + max(0, YH - H)
    Wmax = max(ws)

    ints, yw, xwv, _ = _precompute(
        boxes,
        batch_indices,
        level_assignments,
        jnp.asarray(hs, jnp.int32),
        jnp.asarray(ws, jnp.int32),
        jnp.asarray(ws_true, jnp.int32),
        jnp.asarray(scales, jnp.float32),
        ph,
        pw,
        s,
        XW,
        YH,
    )
    nys = ph * s
    nxs = pw * s
    plane_row0 = ints[:, 0]
    lvl = ints[:, 1]
    y_off = ints[:, 2:]  # [R, nys]
    yw0 = yw[:, :nys]
    yw1 = yw[:, nys:]
    x_start = xwv[:, 0].astype(jnp.int32)
    x_off = xwv[:, 1 : 1 + nxs].astype(jnp.int32)
    x_frac = xwv[:, 1 + nxs : 1 + 2 * nxs]
    x_in = xwv[:, 1 + 2 * nxs :]
    row0_abs = jnp.asarray(row_bases, jnp.int32)[lvl] + plane_row0

    n = min(chunk, max(R, 1))
    pad = (-R) % n
    padz = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    if pad:
        g = padz(g)
        y_off, yw0, yw1 = padz(y_off), padz(yw0), padz(yw1)
        x_start, x_off, x_frac, x_in = padz(x_start), padz(x_off), padz(x_frac), padz(x_in)
        row0_abs = padz(row0_abs)
    n_chunks = g.shape[0] // n

    rc = lambda a: a.reshape((n_chunks, n) + a.shape[1:])
    xs_all = (
        rc(g.astype(jnp.float32)),
        rc(y_off), rc(yw0), rc(yw1),
        rc(x_start), rc(x_off), rc(x_frac), rc(x_in),
        rc(row0_abs),
    )

    iw = jnp.arange(YH, dtype=jnp.int32)
    ix = jnp.arange(XW, dtype=jnp.int32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )

    def body(acc, args):
        cg, cyoff, cyw0, cyw1, cxs, cxoff, cxf, cxin, crow0 = args
        # By[n, w, sy] = [w == y_off+0]*yw0 + [w == y_off+1]*yw1
        By = (
            (iw[None, :, None] == cyoff[:, None, :]).astype(jnp.float32) * cyw0[:, None, :]
            + (iw[None, :, None] == cyoff[:, None, :] + 1).astype(jnp.float32) * cyw1[:, None, :]
        )  # [n, YH, nys]
        xw0 = (1.0 - cxf) * cxin
        xw1 = cxf * cxin
        Bx = (
            (ix[None, :, None] == cxoff[:, None, :]).astype(jnp.float32) * xw0[:, None, :]
            + (ix[None, :, None] == cxoff[:, None, :] + 1).astype(jnp.float32) * xw1[:, None, :]
        ) * (1.0 / (s * s))  # [n, XW, nxs]
        g_s = jnp.repeat(jnp.repeat(cg, s, axis=1), s, axis=2)  # [n, nys, nxs, C]
        tmp = jnp.einsum("nwp,npqc->nwqc", By, g_s)  # [n, YH, nxs, C]
        win = jnp.einsum("nxq,nwqc->nwxc", Bx, tmp)  # [n, YH, XW, C]
        idx = jnp.stack([crow0, cxs], axis=1)  # [n, 2]
        acc = jax.lax.scatter_add(
            acc,
            idx,
            win,
            dnums,
            indices_are_sorted=False,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return acc, None

    acc = jnp.zeros((rows_total, Wmax, C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, xs_all)

    out = {}
    for name, f, H, Wp, W, base in zip(level_order, feats, hs, ws, ws_true, row_bases):
        plane = acc[base : base + B * H, :Wp]
        out[name] = plane.reshape(B, H, Wp, C)[:, :, :W, :].astype(f.dtype)
    return out


def _roi_align_ml_hybrid_bwd(level_order, scales, output_size, sampling_ratio, aligned, res, g):
    """Backward: Pallas read-modify-write window kernel on TPU, XLA vjp
    otherwise.

    Four backward formulations, measured on v5e (Mask R-CNN FPN train step
    batch 8 production config for the step numbers; standalone microbench
    tools/_bench_roi_bwd.py for the op numbers):
      - vjp of the chunked-gather XLA forward:             424.6 ms/step
      - explicit per-element transpose scatter
        (``_roi_align_ml_transpose``, tested above):       775 ms/step (C4 cfg)
      - windowed dense transpose mirroring the Pallas fwd
        (``_roi_align_ml_transpose_window``):              491.2 ms/step
          op-level: 185.6 ms (4096 rois 7x7) + 53.5 ms (1024 rois 14x14)
      - Pallas sequential RMW window kernel (production):
          op-level:  34.7 ms (4096 rois 7x7) + 17.6 ms (1024 rois 14x14)
    The Pallas kernel is the exact adjoint of the Pallas forward (same
    window geometry + clamping; tests/ops/test_roi_align_pallas_bwd.py).
    Box gradients are zero — every caller stop_gradients proposal boxes,
    matching reference semantics (proposals detach before pooling)."""
    import os

    features, boxes, batch_indices, level_assignments = res

    def _float0(x):
        import numpy as np

        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    if (
        jax.default_backend() not in ("cpu",)
        and os.environ.get("D2T_PALLAS_BWD", "1") != "0"
    ):
        from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_backward

        d_features = roi_align_pallas_backward(
            g,
            features,
            boxes,
            batch_indices,
            level_assignments,
            level_order,
            scales,
            output_size,
            sampling_ratio,
            aligned=aligned,
        )
        d_boxes = jnp.zeros_like(boxes)
        return d_features, d_boxes, _float0(batch_indices), _float0(level_assignments)

    _, vjp = jax.vjp(
        lambda f, b: _roi_align_multilevel_xla(
            f, b, batch_indices, level_assignments, level_order, scales, output_size,
            sampling_ratio, aligned,
        ),
        features,
        boxes,
    )
    d_features, d_boxes = vjp(g)
    return d_features, d_boxes, _float0(batch_indices), _float0(level_assignments)


_roi_align_ml_hybrid.defvjp(_roi_align_ml_hybrid_fwd, _roi_align_ml_hybrid_bwd)


def _roi_align_multilevel_xla(
    features: dict,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    level_assignments: jnp.ndarray,
    level_order: Tuple[str, ...],
    scales: Tuple[float, ...],
    output_size: Union[int, Tuple[int, int]],
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """Multi-level RoIAlign with a SINGLE gather pass (XLA formulation).

    TPU-native replacement for the reference ROIPooler's per-level scatter
    loop (detectron2/modeling/poolers.py:245-263): all levels' feature maps
    are flattened into one [sum(B*Hl*Wl), C] buffer; each roi's gather indices
    are offset by its assigned level's base, and its coordinates are scaled by
    that level's spatial scale. One pass, fixed shapes, no per-level masking
    overhead.

    Args:
        features: dict level-name -> [B, Hl, Wl, C].
        boxes: [R, 4] in image coords.
        batch_indices: [R] int.
        level_assignments: [R] int in [0, L).
        level_order: names of levels in assignment order.
        scales: per-level 1/stride.
        output_size, sampling_ratio, aligned: as in roi_align.

    Returns:
        [R, ph, pw, C]
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2

    feats = [features[n] for n in level_order]
    B = feats[0].shape[0]
    C = feats[0].shape[-1]
    dtype = feats[0].dtype
    R = boxes.shape[0]

    # flatten all levels into one buffer; record per-level base offsets
    flat_parts = []
    level_bases = []
    base = 0
    hs, ws = [], []
    for f in feats:
        _, H, W, _ = f.shape
        flat_parts.append(f.reshape(B * H * W, C))
        level_bases.append(base)
        hs.append(H)
        ws.append(W)
        base += B * H * W
    flat = jnp.concatenate(flat_parts, axis=0)

    lvl = level_assignments.astype(jnp.int32)
    level_bases = jnp.asarray(level_bases, jnp.int32)
    hs_a = jnp.asarray(hs, jnp.int32)
    ws_a = jnp.asarray(ws, jnp.int32)
    scales_a = jnp.asarray(scales, jnp.float32)

    roi_scale = scales_a[lvl]  # [R]
    roi_H = hs_a[lvl]
    roi_W = ws_a[lvl]
    roi_base = level_bases[lvl] + batch_indices.astype(jnp.int32) * roi_H * roi_W

    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] * roi_scale - offset
    y0 = boxes[:, 1] * roi_scale - offset
    x1 = boxes[:, 2] * roi_scale - offset
    y1 = boxes[:, 3] * roi_scale - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ix = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    ys = (y0[:, None, None] + (py[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]).reshape(R, ph * s)
    xs = (x0[:, None, None] + (px[None, :, None] + ix[None, None, :]) * bin_w[:, None, None]).reshape(R, pw * s)

    def _prep(coords, size):
        sizef = size.astype(jnp.float32)[:, None]
        inside = (coords >= -1.0) & (coords <= sizef)
        c = jnp.clip(coords, 0.0, sizef - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size[:, None] - 1)
        return lo, hi, frac, inside

    ylo, yhi, yfrac, yin = _prep(ys, roi_H)
    xlo, xhi, xfrac, xin = _prep(xs, roi_W)

    return _chunked_bilinear_pool(
        flat, roi_base, ylo, yhi, yfrac, yin, xlo, xhi, xfrac, xin, roi_W, ph, pw, s, C, dtype
    )
