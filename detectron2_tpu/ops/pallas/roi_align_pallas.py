"""Pallas RoIAlign kernel for TPU.

XLA lowers the gather formulation of RoIAlign (ops/roi_align.py) to row-wise
dynamic slices that run at ~240ns/row on TPU — 1.5s+ for a Mask R-CNN batch
of 8000 rois. This kernel restructures the data movement:

- ONE async copy per roi brings the roi's whole sampling footprint — a
  [YH, XW, C] y-span x x-window block of its (padded) feature level — from
  HBM into VMEM, pipelined 3 deep across rois;
- per output sample row, y-interpolation is a dynamic 2-row blend from the
  window and x-interpolation + bin averaging is ONE small MXU matmul whose
  interpolation matrix is built in-register from iota comparisons;
- per-roi scalars (window origin, level id, per-row y offsets) ride scalar
  prefetch (SMEM), float weights ride aligned VMEM blocks.

Geometry: the window is YH rows x XW columns (default 48 x 64). The FPN level
router bounds a roi's footprint at its assigned level to ~sqrt(wh)/stride<=14,
so spans beyond the window only occur for extreme aspect ratios or
level-clamped giants; their samples are clamped into the window (a
neglible-AP approximation on degenerate boxes).

The backward pass (training) runs the XLA formulation's autodiff via
custom_vjp; inference is where this kernel is critical.
"""

import functools
import os
from typing import List, Tuple

# debug knobs for kernel profiling
_SKIP_DMA = os.environ.get("D2T_RA_SKIP_DMA", "0") == "1"
_SKIP_COMPUTE = os.environ.get("D2T_RA_SKIP_COMPUTE", "0") == "1"

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roi_align_pallas_multilevel"]

ROI_BLOCK = 8  # rois per grid step (keeps VMEM blocks (8, ...) aligned)
N_SLOTS = 4  # DMA pipeline depth; divides ROI_BLOCK so slots are static


def _channel_chunk(C: int, dtype, ph: int, pw: int, XW: int, YH: int) -> int:
    """Largest power-of-two channel slice whose kernel VMEM footprint fits the
    TPU's 16MB scoped-vmem limit: the N_SLOTS window scratch + the
    double-buffered output block + the f32 bin accumulator (the dominant
    allocations; per-roi scalar blocks are KBs)."""
    item = jnp.dtype(dtype).itemsize
    budget = int(15.0 * 2**20)

    def footprint(c):
        window = N_SLOTS * YH * XW * c * item
        out_block = 2 * ROI_BLOCK * ph * pw * c * item  # double-buffered
        acc = ph * pw * c * 4
        return window + out_block + acc

    c = min(C, 512)
    while c > 8 and footprint(c) > budget:
        c //= 2
    return c


def _precompute(
    boxes, batch_indices, level_assignments, hs, ws, ws_true, scales, ph, pw, s, XW, YH,
    aligned=True,
):
    """XLA-side preparation of per-roi scalars and weights.

    Returns:
        ints_i32: [R, 2 + ph*s] — (plane_row0, level, y_off per sample row)
            where plane_row0 = b * H_l + y_first is the window's first row in
            the level's [B*H, W, C] plane and y_off the per-sample-row offset
            within the window.
        yw_f32: [R, 2*ph*s] — (1-fy)*valid then fy*valid per sample row.
        xw_f32: [R, 1 + 3*pw*s] — x_start then x_off / x_frac / x_valid.
    """
    R = boxes.shape[0]
    lvl = level_assignments.astype(jnp.int32)
    H = hs[lvl].astype(jnp.float32)
    Hi = hs[lvl]
    W = ws_true[lvl].astype(jnp.float32)  # true width: clipping/validity
    Wi = ws[lvl]  # padded width
    scale = scales[lvl]

    b = boxes.astype(jnp.float32)
    off = 0.5 if aligned else 0.0
    x0 = b[:, 0] * scale - off
    y0 = b[:, 1] * scale - off
    x1 = b[:, 2] * scale - off
    y1 = b[:, 3] * scale - off
    roi_h = y1 - y0
    roi_w = x1 - x0
    if not aligned:  # legacy ROIAlign (v1) clamps tiny rois to 1x1
        roi_h = jnp.maximum(roi_h, 1.0)
        roi_w = jnp.maximum(roi_w, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    iy = (jnp.arange(ph * s, dtype=jnp.float32) + 0.5) / s
    ix = (jnp.arange(pw * s, dtype=jnp.float32) + 0.5) / s
    ys = y0[:, None] + iy[None, :] * bin_h[:, None]  # [R, ph*s]
    xs = x0[:, None] + ix[None, :] * bin_w[:, None]  # [R, pw*s]

    # ---- y: window of YH rows; sample offsets within it
    y_in = (ys >= -1.0) & (ys <= H[:, None])
    yc = jnp.clip(ys, 0.0, H[:, None] - 1.0)
    ylo = jnp.floor(yc).astype(jnp.int32)
    ylo = jnp.clip(ylo, 0, jnp.maximum(Hi[:, None] - 2, 0))
    y_first = jnp.clip(jnp.min(ylo, axis=1), 0, jnp.maximum(Hi - YH, 0))  # [R]
    y_off = jnp.clip(ylo - y_first[:, None], 0, YH - 2)
    fy = jnp.clip(yc - (y_first[:, None] + y_off).astype(jnp.float32), 0.0, 1.0)
    yw0 = (1.0 - fy) * y_in
    yw1 = fy * y_in

    plane_row0 = batch_indices.astype(jnp.int32) * Hi + y_first  # [R]

    # ---- x: window of XW cols, start aligned to 8 for tiled HBM slicing
    x_in = ((xs >= -1.0) & (xs <= W[:, None])).astype(jnp.float32)
    xc = jnp.clip(xs, 0.0, W[:, None] - 1.0)
    xlo = jnp.floor(xc).astype(jnp.int32)
    x_start = jnp.clip((jnp.min(xlo, axis=1) // 8) * 8, 0, jnp.maximum(Wi - XW, 0))
    x_off = jnp.clip(xlo - x_start[:, None], 0, XW - 2)
    x_frac = jnp.clip(xc - (x_start[:, None] + x_off).astype(jnp.float32), 0.0, 1.0)

    ints_i32 = jnp.concatenate(
        [plane_row0[:, None], lvl[:, None], y_off], axis=1
    ).astype(jnp.int32)
    yw_f32 = jnp.concatenate([yw0, yw1], axis=1).astype(jnp.float32)
    xw_f32 = jnp.concatenate(
        [x_start[:, None].astype(jnp.float32), x_off.astype(jnp.float32), x_frac, x_in], axis=1
    ).astype(jnp.float32)
    return ints_i32, yw_f32, xw_f32, x_start.astype(jnp.int32)


def _make_kernel(ph, pw, s, XW, YH, C, num_levels, total_rois):
    n_rows = ph * s

    def kernel(ints_ref, yw_ref, xs_ref, xw_ref, *rest):
        # rest: num_levels level planes (ANY), out_ref, win, acc, sems
        level_refs = rest[:num_levels]
        out_ref = rest[num_levels]
        win_ref = rest[num_levels + 1]
        acc_ref = rest[num_levels + 2]
        sems = rest[num_levels + 3]

        block0 = pl.program_id(0) * ROI_BLOCK

        def dma(a, slot, L):
            row0 = ints_ref[a, 0]
            xst = pl.multiple_of(xs_ref[a], 8)
            return pltpu.make_async_copy(
                level_refs[L].at[pl.ds(row0, YH), pl.ds(xst, XW), :],
                win_ref.at[pl.ds(slot * YH, YH)],
                sems.at[slot],
            )

        def issue(a, slot):
            if _SKIP_DMA:
                return
            lvl = ints_ref[a, 1]
            for L in range(num_levels):
                @pl.when(lvl == L)
                def _():
                    dma(a, slot, L).start()

        def wait(a, slot):
            if _SKIP_DMA:
                return
            lvl = ints_ref[a, 1]
            for L in range(num_levels):
                @pl.when(lvl == L)
                def _():
                    dma(a, slot, L).wait()

        # prologue: fill the pipeline on the first grid step only
        @pl.when(pl.program_id(0) == 0)
        def _():
            for k in range(min(N_SLOTS - 1, ROI_BLOCK)):
                issue(block0 + k, k % N_SLOTS)

        col_ids = lax.broadcasted_iota(jnp.int32, (pw * s, XW), 1).astype(jnp.float32)

        for j in range(ROI_BLOCK):
            a = block0 + j
            slot = j % N_SLOTS  # static: ROI_BLOCK % N_SLOTS == 0

            nxt = a + (N_SLOTS - 1)

            @pl.when(nxt < total_rois)
            def _():
                issue(nxt, (j + N_SLOTS - 1) % N_SLOTS)

            wait(a, slot)

            # x interpolation matrix folded with both bin averages: [pw, XW]
            x_off = xw_ref[j, 1 : 1 + pw * s][:, None]
            x_frac = xw_ref[j, 1 + pw * s : 1 + 2 * pw * s][:, None]
            x_val = xw_ref[j, 1 + 2 * pw * s : 1 + 3 * pw * s][:, None]
            wx_samples = jnp.where(col_ids == x_off, (1.0 - x_frac) * x_val, 0.0) + jnp.where(
                col_ids == x_off + 1.0, x_frac * x_val, 0.0
            )
            wx = wx_samples.reshape(pw, s, XW).sum(axis=1) * (1.0 / (s * s))  # [pw, XW]

            dt = win_ref.dtype
            wx_d = wx.astype(dt)
            acc_ref[:] = jnp.zeros((ph * pw, C), jnp.float32)
            for i in range(0) if _SKIP_COMPUTE else range(n_rows):
                yo = ints_ref[a, 2 + i]
                # dynamic offset on the MAJOR dim only (cheap slice)
                pair = win_ref[pl.ds(slot * YH + yo, 2)]  # [2, XW, C]
                w0 = yw_ref[a, i].astype(dt)
                w1 = yw_ref[a, n_rows + i].astype(dt)
                blended = pair[0] * w0 + pair[1] * w1
                # native-dtype MXU matmul with f32 accumulation
                contrib = jnp.dot(wx_d, blended, preferred_element_type=jnp.float32)
                acc_ref[(i // s) * pw : (i // s + 1) * pw, :] += contrib

            out_ref[j] = acc_ref[:].reshape(ph, pw, C).astype(out_ref.dtype)

    return kernel


def roi_align_pallas_multilevel(
    features: dict,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    level_assignments: jnp.ndarray,
    level_order: Tuple[str, ...],
    scales: Tuple[float, ...],
    output_size,
    sampling_ratio: int = 0,
    aligned: bool = True,
    x_window: int = 64,
    y_window: int = 48,
    x_window_small: int = 32,
    y_window_small: int = 32,
    split_min_rois: int = 2048,
) -> jnp.ndarray:
    """Drop-in replacement for ops.roi_align.roi_align_multilevel (same
    argument contract), running the Pallas kernel. aligned=True gives the
    ROIAlignV2 half-pixel grid; aligned=False the legacy ROIAlign (v1) grid
    (no offset, rois clamped to >=1x1 feature px — torchvision parity, used
    by the DensePose zoo configs).

    The kernel's HBM traffic is one [y_window, x_window, C] DMA per roi, so
    at production roi counts (16x1000 box-head pools) the op is DMA-bound.
    Most rois don't need the full window: the FPN router bounds an in-band
    roi's footprint at ~14*sqrt(aspect) feature px, so for R >= split_min_rois
    the rois are size-sorted and the ~7/8 with the smallest footprints run a
    [y_window_small, x_window_small] kernel (4x less DMA) while the largest
    R/8 keep the full window. The split is EXACT for every roi whose
    footprint fits its assigned window (window origin shifts cancel in the
    bilinear arithmetic); only if more than R/8 rois exceed the small window
    do the least-oversize overflow rois fall back to edge-clamped sampling
    (the same approximation the full window applies beyond aspect 8, see
    docs/notes/compatibility.md). Measured on the box-head shape (16k rois,
    7x7, C=256, v5e): 31.9 ms full-window -> ~17 ms split."""
    R = boxes.shape[0]
    small_ok = (
        R >= split_min_rois
        and x_window_small > 0
        and y_window_small > 0
        and (x_window_small < x_window or y_window_small < y_window)
    )
    if small_ok:
        lvl = level_assignments.astype(jnp.int32)
        scale = jnp.asarray(scales, jnp.float32)[lvl]
        b = boxes.astype(jnp.float32)
        # conservative footprint: roi span + bilinear neighbor + x 8-alignment
        fw = (b[:, 2] - b[:, 0]) * scale + 2.0 + 7.0
        fh = (b[:, 3] - b[:, 1]) * scale + 2.0
        oversize = jnp.maximum(fw / x_window_small, fh / y_window_small)
        order = jnp.argsort(oversize)  # ascending: suffix = most oversize
        cap = max(ROI_BLOCK, ((R // 8 + ROI_BLOCK - 1) // ROI_BLOCK) * ROI_BLOCK)
        n_small = R - cap
        if n_small > 0:
            idx_s, idx_b = order[:n_small], order[n_small:]
            out_s = roi_align_pallas_multilevel(
                features,
                boxes[idx_s],
                batch_indices[idx_s],
                level_assignments[idx_s],
                level_order,
                scales,
                output_size,
                sampling_ratio,
                aligned,
                x_window_small,
                y_window_small,
                split_min_rois=R + 1,  # no recursive re-split
            )
            out_b = roi_align_pallas_multilevel(
                features,
                boxes[idx_b],
                batch_indices[idx_b],
                level_assignments[idx_b],
                level_order,
                scales,
                output_size,
                sampling_ratio,
                aligned,
                x_window,
                y_window,
                split_min_rois=R + 1,
            )
            inv = jnp.zeros((R,), jnp.int32).at[order].set(jnp.arange(R, dtype=jnp.int32))
            return jnp.concatenate([out_s, out_b], axis=0)[inv]
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2
    XW = x_window
    YH = y_window

    feats = [features[n] for n in level_order]
    B, _, _, C = feats[0].shape
    dtype = feats[0].dtype
    R = boxes.shape[0]

    # scoped-vmem budget: chunk channels so the kernel's VMEM footprint fits
    # the 16MB scoped limit, and stack the calls (same total HBM traffic;
    # scalar precompute is re-done per chunk but is negligible). A static
    # 512-for-bf16 bound OOMed on the C4 head (C=512 @ 14x14: the bigger
    # out block + f32 accumulator push it 4KB over).
    max_c = _channel_chunk(C, dtype, ph, pw, XW, YH)
    if C > max_c:
        outs = []
        for cc in range(0, C, max_c):
            sub = {n: features[n][..., cc : cc + max_c] for n in level_order}
            outs.append(
                roi_align_pallas_multilevel(
                    sub,
                    boxes,
                    batch_indices,
                    level_assignments,
                    level_order,
                    scales,
                    output_size,
                    sampling_ratio,
                    aligned,
                    x_window,
                    y_window,
                    split_min_rois=R + 1,  # size-split (if any) already happened above
                )
            )
        return jnp.concatenate(outs, axis=-1)

    planes, hs, ws, ws_true = [], [], [], []
    for f in feats:
        _, H, W, _ = f.shape
        ws_true.append(W)
        Wp = ((W + 7) // 8) * 8
        if Wp != W:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
        # Pad plane rows so a YH-row window anchored anywhere inside the LAST
        # image stays in bounds: window start is at most (B-1)*H (y_first is
        # clamped per-image), so the plane needs (B-1)*H + YH rows. Without
        # this, any level with H < YH (e.g. p5/p6 at 1024px) reads past the
        # plane for rois in the last image; backends that clamp dynamic-slice
        # starts then silently shift the window into the previous image.
        plane = f.reshape(B * H, Wp, C)
        pad_rows = max(0, YH - H)
        if pad_rows:
            plane = jnp.pad(plane, ((0, pad_rows), (0, 0), (0, 0)))
        # ensure XW columns exist
        if Wp < XW:
            plane = jnp.pad(plane, ((0, 0), (0, XW - Wp), (0, 0)))
            Wp = XW
        planes.append(plane)
        hs.append(H)
        ws.append(Wp)

    pad = (-R) % ROI_BLOCK
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], boxes.dtype), (pad, 1))], axis=0
        )
        batch_indices = jnp.concatenate([batch_indices, jnp.zeros((pad,), batch_indices.dtype)])
        level_assignments = jnp.concatenate(
            [level_assignments, jnp.zeros((pad,), level_assignments.dtype)]
        )
    Rp = boxes.shape[0]

    ints_i32, yw_f32, xw_f32, x_start = _precompute(
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
        aligned=aligned,
    )

    NX = 1 + 3 * pw * s
    num_levels = len(planes)

    # scalar-prefetch arrays live wholly in SMEM (1MB) -> chunk the call
    CHUNK = 512
    outs = []
    for c0 in range(0, Rp, CHUNK):
        c1 = min(c0 + CHUNK, Rp)
        n = c1 - c0
        kernel = _make_kernel(ph, pw, s, XW, YH, C, num_levels, n)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # ints, yw, x_start
            grid=(n // ROI_BLOCK,),
            in_specs=[
                pl.BlockSpec((ROI_BLOCK, NX), lambda r, *_: (r, 0), memory_space=pltpu.VMEM),
            ]
            + [pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
            out_specs=pl.BlockSpec(
                (ROI_BLOCK, ph, pw, C), lambda r, *_: (r, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((N_SLOTS * YH, XW, C), dtype),
                pltpu.VMEM((ph * pw, C), jnp.float32),
                pltpu.SemaphoreType.DMA((N_SLOTS,)),
            ],
        )
        outs.append(
            pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n, ph, pw, C), dtype),
            )(ints_i32[c0:c1], yw_f32[c0:c1], x_start[c0:c1], xw_f32[c0:c1], *planes)
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:R]


# ---------------------------------------------------------------------------
# Backward: gradient scatter as sequential read-modify-write window DMAs
# ---------------------------------------------------------------------------


def _make_bwd_kernel(ph, pw, s, XW, YH, C, num_levels, total_rois):
    n_rows = ph * s

    def kernel(ints_ref, yw_ref, xs_ref, xw_ref, grad_ref, *rest):
        # rest: num_levels aliased input plane refs (ANY, unused — the same
        # buffers arrive again as outputs), num_levels out plane refs (ANY),
        # gx scratch, rw scratch, sems
        out_planes = rest[num_levels : 2 * num_levels]
        gx_ref = rest[2 * num_levels]
        rw_ref = rest[2 * num_levels + 1]
        sems = rest[2 * num_levels + 2]

        block0 = pl.program_id(0) * ROI_BLOCK
        col_ids = lax.broadcasted_iota(jnp.int32, (pw * s, XW), 1).astype(jnp.float32)

        def rmw(a, mk):
            lvl = ints_ref[a, 1]
            row0 = ints_ref[a, 0]
            xst = pl.multiple_of(xs_ref[a], 8)
            for L in range(num_levels):
                @pl.when(lvl == L)
                def _():
                    mk(out_planes[L].at[pl.ds(row0, YH), pl.ds(xst, XW), :])

        for j in range(ROI_BLOCK):
            a = block0 + j

            # start the window read early; the gx matmuls overlap it
            def rd(tgt):
                cp = pltpu.make_async_copy(tgt, rw_ref, sems.at[0])
                cp.start()
            rmw(a, rd)

            # x adjoint matrix: same wx as the forward ([pw, XW], bin-avg and
            # validity folded in), contracted on its bin dim
            x_off = xw_ref[j, 1 : 1 + pw * s][:, None]
            x_frac = xw_ref[j, 1 + pw * s : 1 + 2 * pw * s][:, None]
            x_val = xw_ref[j, 1 + 2 * pw * s : 1 + 3 * pw * s][:, None]
            wx_samples = jnp.where(col_ids == x_off, (1.0 - x_frac) * x_val, 0.0) + jnp.where(
                col_ids == x_off + 1.0, x_frac * x_val, 0.0
            )
            wx = wx_samples.reshape(pw, s, XW).sum(axis=1) * (1.0 / (s * s))  # [pw, XW]

            for p in range(ph):
                g_bin = grad_ref[j, p].astype(jnp.float32)  # [pw, C]
                # gx_p[x, c] = sum_q wx[q, x] * g_bin[q, c]  (transposed-lhs MXU)
                gx_ref[p] = lax.dot_general(
                    wx, g_bin, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )

            def wait_rd(tgt):
                pltpu.make_async_copy(tgt, rw_ref, sems.at[0]).wait()
            rmw(a, wait_rd)

            # y adjoint: per sample row, two window rows get w0/w1-weighted gx
            for i in range(n_rows):
                yo = ints_ref[a, 2 + i]
                w0 = yw_ref[a, i]
                w1 = yw_ref[a, n_rows + i]
                gx = gx_ref[i // s]  # [XW, C]
                pair = rw_ref[pl.ds(yo, 2)]  # [2, XW, C]
                upd = jnp.stack([pair[0] + w0 * gx, pair[1] + w1 * gx])
                rw_ref[pl.ds(yo, 2)] = upd

            def wr(tgt):
                cp = pltpu.make_async_copy(rw_ref, tgt, sems.at[0])
                cp.start()
            rmw(a, wr)

            def wait_wr(tgt):
                pltpu.make_async_copy(rw_ref, tgt, sems.at[0]).wait()
            rmw(a, wait_wr)

    return kernel


def roi_align_pallas_backward(
    g: jnp.ndarray,  # [R, ph, pw, C] cotangent
    features: dict,  # level -> [B, H, W, C] (shape/dtype reference only)
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    level_assignments: jnp.ndarray,
    level_order: Tuple[str, ...],
    scales: Tuple[float, ...],
    output_size,
    sampling_ratio: int = 0,
    x_window: int = 64,
    y_window: int = 48,
    aligned: bool = True,
) -> dict:
    """Feature gradients of the Pallas RoIAlign forward.

    The XLA alternatives scatter per-element (~4.8M updates) or per-window
    (via lax.scatter_add of [R, YH, XW, C] windows); both are scatter-bound on
    TPU. Here each roi's gradient window is built in VMEM (one transposed MXU
    matmul per output bin row + 2 weighted row adds per sample row) and
    accumulated into the level plane with a sequential read-modify-write DMA
    pair — the TPU-native form of atomics. Grid steps run sequentially on TPU,
    so overlapping roi windows are race-free by construction.

    With (y_window, x_window) equal to the forward's, this is the exact
    adjoint of the forward, clamping included. Boxes/indices get no gradient
    (proposals are stop_gradient'ed by all callers, matching the reference).
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    s = int(sampling_ratio) if sampling_ratio > 0 else 2
    XW, YH = x_window, y_window

    feats = [features[n] for n in level_order]
    B, _, _, C = feats[0].shape
    R = boxes.shape[0]

    # mirror the forward's channel chunking (scoped-vmem bound); each chunk
    # accumulates its own channel slice of the gradient planes
    max_c = 256  # bwd scratch is always f32
    if C > max_c:
        grads = []
        for cc in range(0, C, max_c):
            sub = {n: features[n][..., cc : cc + max_c] for n in level_order}
            grads.append(
                roi_align_pallas_backward(
                    g[..., cc : cc + max_c],
                    sub,
                    boxes,
                    batch_indices,
                    level_assignments,
                    level_order,
                    scales,
                    output_size,
                    sampling_ratio,
                    x_window,
                    y_window,
                    aligned,
                )
            )
        return {
            n: jnp.concatenate([gr[n] for gr in grads], axis=-1) for n in level_order
        }

    hs, ws, ws_true, plane_shapes = [], [], [], []
    for f in feats:
        _, H, W, _ = f.shape
        Wp = max(((W + 7) // 8) * 8, XW)
        hs.append(H)
        ws.append(Wp)
        ws_true.append(W)
        plane_shapes.append((B * H + max(0, YH - H), Wp, C))

    pad = (-R) % ROI_BLOCK
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], boxes.dtype), (pad, 1))], axis=0
        )
        batch_indices = jnp.concatenate([batch_indices, jnp.zeros((pad,), batch_indices.dtype)])
        level_assignments = jnp.concatenate(
            [level_assignments, jnp.zeros((pad,), level_assignments.dtype)]
        )
        g = jnp.concatenate([g, jnp.zeros((pad, ph, pw, C), g.dtype)], axis=0)
    Rp = boxes.shape[0]

    ints_i32, yw_f32, xw_f32, x_start = _precompute(
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
        aligned=aligned,
    )

    NX = 1 + 3 * pw * s
    num_levels = len(feats)
    planes = [jnp.zeros(ps, jnp.float32) for ps in plane_shapes]

    CHUNK = 512
    for c0 in range(0, Rp, CHUNK):
        c1 = min(c0 + CHUNK, Rp)
        n = c1 - c0
        kernel = _make_bwd_kernel(ph, pw, s, XW, YH, C, num_levels, n)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # ints, yw, x_start
            grid=(n // ROI_BLOCK,),
            in_specs=[
                pl.BlockSpec((ROI_BLOCK, NX), lambda r, *_: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (ROI_BLOCK, ph, pw, C), lambda r, *_: (r, 0, 0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + [pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
            scratch_shapes=[
                pltpu.VMEM((ph, XW, C), jnp.float32),
                pltpu.VMEM((YH, XW, C), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )
        planes = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(ps, jnp.float32) for ps in plane_shapes],
            input_output_aliases={5 + l: l for l in range(num_levels)},
        )(
            ints_i32[c0:c1],
            yw_f32[c0:c1],
            x_start[c0:c1],
            xw_f32[c0:c1],
            g[c0:c1].astype(jnp.float32),
            *planes,
        )
        if not isinstance(planes, (list, tuple)):
            planes = [planes]

    out = {}
    for name, f, H, Wp, W, plane in zip(level_order, feats, hs, ws, ws_true, planes):
        out[name] = plane[: B * H, :W].reshape(B, H, W, C).astype(f.dtype)
    return out
