"""Pallas RoIAlign vs the XLA gather formulation (interpret mode on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import detectron2_tpu.ops.pallas.roi_align_pallas as rap
from detectron2_tpu.ops.roi_align import roi_align_multilevel


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _setup(R=40, C=128, seed=0):
    rng = np.random.RandomState(seed)
    feats = {
        "0": jnp.asarray(rng.rand(2, 32, 48, C).astype(np.float32)),
        "1": jnp.asarray(rng.rand(2, 16, 24, C).astype(np.float32)),
    }
    xy = rng.rand(R, 2) * 100
    wh = rng.rand(R, 2) * 60 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
    lvl = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
    return feats, boxes, bidx, lvl


def test_matches_xla_formulation():
    feats, boxes, bidx, lvl = _setup()
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = roi_align_multilevel(*args, sampling_ratio=2)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_mask_resolution():
    feats, boxes, bidx, lvl = _setup(R=16)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (14, 14))
    ref = roi_align_multilevel(*args, sampling_ratio=2)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_out_of_bounds_boxes():
    feats, _, bidx, lvl = _setup(R=4)
    # boxes partially outside the image; padding rows (zero boxes)
    boxes = jnp.asarray(
        [
            [-20.0, -20.0, 40.0, 40.0],
            [100.0, 60.0, 300.0, 200.0],
            [0.0, 0.0, 0.0, 0.0],
            [5.0, 5.0, 6.0, 6.0],
        ],
        jnp.float32,
    )
    args = (feats, boxes, bidx[:4], lvl[:4], ("0", "1"), (0.25, 0.125), (7, 7))
    ref = roi_align_multilevel(*args, sampling_ratio=2)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_extreme_aspect_ratio_boxes():
    """Boxes beyond the kernel's DMA window aspect limits (>19:1 both ways,
    plus level-clamped giants): the clamped-window approximation must stay
    within a small error of the exact XLA formulation — this bounds the
    'negligible AP' claim in roi_align_pallas.py's window-clamp note."""
    feats, _, _, _ = _setup(R=6)
    boxes = jnp.asarray(
        [
            [2.0, 40.0, 190.0, 44.0],  # 47:1 wide
            [60.0, 1.0, 64.0, 120.0],  # 1:30 tall
            [0.0, 0.0, 191.0, 8.0],  # full-width sliver
            [0.0, 0.0, 190.0, 126.0],  # giant box on the fine level
            [10.0, 10.0, 180.0, 20.0],  # 17:1 (inside limits, control)
            [20.0, 20.0, 60.0, 60.0],  # normal (control)
        ],
        jnp.float32,
    )
    bidx = jnp.zeros(6, jnp.int32)
    lvl = jnp.asarray([0, 0, 0, 0, 0, 0], jnp.int32)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = np.asarray(roi_align_multilevel(*args, sampling_ratio=2))
    out = np.asarray(rap.roi_align_pallas_multilevel(*args, sampling_ratio=2))
    assert np.isfinite(out).all()
    # controls must be exact
    np.testing.assert_allclose(out[4:], ref[4:], rtol=1e-4, atol=1e-4)
    # clamped extremes: bounded relative error on the pooled features
    denom = np.maximum(np.abs(ref[:4]).mean(axis=(1, 2, 3), keepdims=True), 1e-3)
    rel = np.abs(out[:4] - ref[:4]).mean(axis=(1, 2, 3), keepdims=True) / denom
    assert (rel < 0.15).all(), f"clamped-window error too large: {rel.ravel()}"


def test_wide_channels_chunked():
    """C4-width channels (C > 256) go through the channel-chunked path (the
    un-chunked window scratch exceeds the 16MB scoped-vmem limit on TPU)."""
    feats, boxes, bidx, lvl = _setup(R=16, C=320)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = roi_align_multilevel(*args, sampling_ratio=2)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_wide_channels_chunked_backward():
    feats, boxes, bidx, lvl = _setup(R=16, C=320)
    g = jnp.asarray(np.random.RandomState(3).rand(16, 7, 7, 320).astype(np.float32))
    grads = rap.roi_align_pallas_backward(
        g, feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7), sampling_ratio=2
    )
    # adjoint identity vs the XLA forward's vjp
    def fwd(fs):
        return roi_align_multilevel(
            fs, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7), sampling_ratio=2
        )

    _, vjp = jax.vjp(fwd, feats)
    (ref_grads,) = vjp(g)
    for k in feats:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]), rtol=1e-3, atol=1e-3
        )


def test_channel_chunk_fits_scoped_vmem():
    """The channel-chunk bound must keep the kernel's dominant VMEM
    allocations (N_SLOTS window + double-buffered out block + f32
    accumulator) under the TPU's 16MB scoped limit — the static 512-for-bf16
    bound OOMed on the real chip for the C4 head (C=512 @ 14x14, 4KB over)."""
    import jax.numpy as jnp

    from detectron2_tpu.ops.pallas.roi_align_pallas import (
        N_SLOTS,
        ROI_BLOCK,
        _channel_chunk,
    )

    def footprint(c, item, ph, pw, XW=64, YH=48):
        return N_SLOTS * YH * XW * c * item + 2 * ROI_BLOCK * ph * pw * c * item + ph * pw * c * 4

    for C, dt, ph in [(512, jnp.bfloat16, 14), (256, jnp.bfloat16, 7),
                      (1024, jnp.bfloat16, 7), (512, jnp.float32, 14)]:
        c = _channel_chunk(C, dt, ph, ph, 64, 48)
        assert C % c == 0, (C, c)
        assert footprint(c, jnp.dtype(dt).itemsize, ph, ph) <= 16 * 2**20, (C, dt, ph, c)
    # the exact case that OOMed: must chunk below 512
    assert _channel_chunk(512, jnp.bfloat16, 14, 14, 64, 48) < 512
    # the standard FPN case must stay unchunked
    assert _channel_chunk(256, jnp.bfloat16, 7, 7, 64, 48) == 256


def test_size_split_exact_for_in_window_rois():
    """The R>=split_min_rois size-split (small-window kernel for the ~7/8
    smallest-footprint rois) must be bit-equal to the unsplit full-window
    run whenever every roi's footprint fits its assigned window — the window
    origin shift cancels in the bilinear arithmetic. Forces the split with a
    tiny split_min_rois; also checks the argsort order-restore."""
    feats, boxes, bidx, lvl = _setup(R=40)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    full = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2)
    split = rap.roi_align_pallas_multilevel(
        *args,
        sampling_ratio=2,
        x_window_small=32,
        y_window_small=32,
        split_min_rois=16,
    )
    assert split.shape == full.shape
    # Bit-equality holds in interpret mode (the autouse fixture): zero-weight
    # window columns contribute exact zeros, so the shifted-origin small run
    # reproduces the full-window arithmetic exactly. On a real TPU the MXU
    # reduction tree / padding could legally break bit-identity while staying
    # mathematically equal — if this test is ever ported on-device, relax to
    # assert_allclose with a tiny tolerance.
    np.testing.assert_array_equal(np.asarray(split), np.asarray(full))


def test_size_split_quota_covers_all_oversize():
    """Degenerate case: when every roi is oversize but the big-window quota
    (max(ROI_BLOCK, R/8)) covers all of them, the split collapses to the full
    window (n_small=0) and must match the XLA reference exactly."""
    feats, _, _, _ = _setup(R=8)
    rng = np.random.RandomState(3)
    # all 8 rois are huge on level 0 (scale .25): footprint ~45px > 32 window
    xy = rng.rand(8, 2) * 10
    boxes = jnp.asarray(
        np.concatenate([xy, xy + np.array([170.0, 110.0])], 1).astype(np.float32)
    )
    bidx = jnp.zeros((8,), jnp.int32)
    lvl = jnp.zeros((8,), jnp.int32)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = roi_align_multilevel(*args, sampling_ratio=2)
    out = rap.roi_align_pallas_multilevel(
        *args,
        sampling_ratio=2,
        x_window_small=32,
        y_window_small=32,
        split_min_rois=8,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_size_split_oversize_overflow_stays_close():
    """If more rois exceed the small window than the big-window quota (R/8),
    the overflow rois run the small window with edge-clamped sampling. With
    R=16 and split_min_rois=16 the quota is 8, so 8 of the 16 all-oversize
    rois are genuinely forced through the 32x32 small window: the result must
    stay finite and within the error envelope the clamp is documented to have
    (compatibility.md aspect tables)."""
    feats, _, _, _ = _setup(R=16)
    rng = np.random.RandomState(3)
    # all 16 rois are huge on level 0 (scale .25): footprint ~45px > 32 window
    xy = rng.rand(16, 2) * 10
    boxes = jnp.asarray(
        np.concatenate([xy, xy + np.array([170.0, 110.0])], 1).astype(np.float32)
    )
    bidx = jnp.zeros((16,), jnp.int32)
    lvl = jnp.zeros((16,), jnp.int32)
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = np.asarray(roi_align_multilevel(*args, sampling_ratio=2))
    out = np.asarray(
        rap.roi_align_pallas_multilevel(
            *args,
            sampling_ratio=2,
            x_window_small=32,
            y_window_small=32,
            split_min_rois=16,
        )
    )
    assert np.isfinite(out).all()
    # bounded relative error per roi (same envelope as the aspect-clamp test)
    denom = np.maximum(np.abs(ref).mean(axis=(1, 2, 3), keepdims=True), 1e-3)
    rel = np.abs(out - ref).mean(axis=(1, 2, 3), keepdims=True) / denom
    assert (rel < 0.15).all(), f"edge-clamped overflow error too large: {rel.ravel()}"


def test_aligned_false_v1_matches_xla():
    """aligned=False (legacy ROIAlign v1 — the grid every DensePose zoo
    config pools with, reference Base-DensePose-RCNN-FPN.yaml POOLER_TYPE
    "ROIAlign"): no half-pixel offset, rois clamped to >=1x1 feature px.
    Includes a sub-pixel box to exercise the clamp."""
    feats, boxes, bidx, lvl = _setup()
    boxes = boxes.at[0].set(jnp.asarray([10.0, 10.0, 10.5, 10.2]))  # sub-1px roi
    args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
    ref = roi_align_multilevel(*args, sampling_ratio=2, aligned=False, use_pallas=False)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2, aligned=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # sanity: the flag actually switches grids
    out_v2 = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2, aligned=True)
    assert not np.allclose(np.asarray(out), np.asarray(out_v2), atol=1e-3)


def test_aligned_false_densepose_pool_shape():
    """The DensePose head pool: 28x28, sampling_ratio 2, single stride-4
    level, aligned=False. Boxes sized to fit the DMA window at stride 4."""
    rng = np.random.RandomState(3)
    C = 32
    feats = {"0": jnp.asarray(rng.rand(2, 64, 88, C).astype(np.float32))}
    xy = rng.rand(12, 2) * 120
    wh = rng.rand(12, 2) * 120 + 16
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, 2, 12), jnp.int32)
    lvl = jnp.zeros((12,), jnp.int32)
    args = (feats, boxes, bidx, lvl, ("0",), (0.25,), (28, 28))
    ref = roi_align_multilevel(*args, sampling_ratio=2, aligned=False, use_pallas=False)
    out = rap.roi_align_pallas_multilevel(*args, sampling_ratio=2, aligned=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
