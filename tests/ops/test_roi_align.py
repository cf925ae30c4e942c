"""RoIAlign tests against a slow numpy reference, mirroring the semantics
checks of reference tests/layers/test_roi_align.py (aligned=True half-pixel
correction, gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.roi_align import roi_align


def slow_roi_align_single(feat, box, output_size, spatial_scale, sampling_ratio, aligned):
    """Numpy reference: feat [H, W], box [4]."""
    H, W = feat.shape
    ph, pw = output_size
    s = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0
    x0 = box[0] * spatial_scale - offset
    y0 = box[1] * spatial_scale - offset
    x1 = box[2] * spatial_scale - offset
    y1 = box[3] * spatial_scale - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = max(roi_w, 1.0)
        roi_h = max(roi_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return 0.0
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0i, x0i = int(np.floor(y)), int(np.floor(x))
        y1i, x1i = min(y0i + 1, H - 1), min(x0i + 1, W - 1)
        ly, lx = y - y0i, x - x0i
        return (
            feat[y0i, x0i] * (1 - ly) * (1 - lx)
            + feat[y0i, x1i] * (1 - ly) * lx
            + feat[y1i, x0i] * ly * (1 - lx)
            + feat[y1i, x1i] * ly * lx
        )

    out = np.zeros((ph, pw))
    for py in range(ph):
        for px in range(pw):
            acc = 0.0
            for iy in range(s):
                for ix in range(s):
                    y = y0 + (py + (iy + 0.5) / s) * bin_h
                    x = x0 + (px + (ix + 0.5) / s) * bin_w
                    acc += bilinear(y, x)
            out[py, px] = acc / (s * s)
    return out


@pytest.mark.parametrize("aligned", [True, False])
@pytest.mark.parametrize("sampling_ratio", [2, 1])
def test_roi_align_vs_numpy(aligned, sampling_ratio):
    rng = np.random.RandomState(0)
    feat = rng.rand(1, 12, 16, 1).astype(np.float32)
    boxes = np.array([[1.0, 1.0, 9.0, 7.0], [0.0, 0.0, 16.0, 12.0], [2.5, 3.5, 6.5, 9.5]], np.float32)
    out = roi_align(
        jnp.asarray(feat),
        jnp.asarray(boxes),
        jnp.zeros(3, jnp.int32),
        output_size=(5, 5),
        spatial_scale=1.0,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )
    for r in range(3):
        expected = slow_roi_align_single(feat[0, :, :, 0], boxes[r], (5, 5), 1.0, sampling_ratio, aligned)
        np.testing.assert_allclose(np.asarray(out[r, :, :, 0]), expected, rtol=1e-4, atol=1e-5)


def test_roi_align_aligned_exact_value():
    """The canonical half-pixel test: a 2x resolution grid with aligned=True
    recovers exact feature values (reference test_roi_align.py semantics)."""
    feat = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    # box covering exactly the full feature map in a 2x-scaled image space
    boxes = np.array([[0.0, 0.0, 8.0, 8.0]], np.float32)
    out = roi_align(
        jnp.asarray(feat),
        jnp.asarray(boxes),
        jnp.zeros(1, jnp.int32),
        output_size=(4, 4),
        spatial_scale=0.5,
        sampling_ratio=1,
        aligned=True,
    )
    # with aligned=True, each output bin center lands exactly on the feature pixel center
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), feat[0, :, :, 0], atol=1e-5)


def test_roi_align_batch_indices():
    feat = np.stack([np.zeros((8, 8, 1), np.float32), np.ones((8, 8, 1), np.float32)])
    boxes = np.array([[1, 1, 5, 5], [1, 1, 5, 5]], np.float32)
    out = roi_align(
        jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray([0, 1], jnp.int32), output_size=2
    )
    assert float(out[0].sum()) == 0.0
    np.testing.assert_allclose(np.asarray(out[1]), 1.0)


def test_roi_align_grad():
    """Gradients flow to both features and boxes."""
    feat = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 2).astype(np.float32))
    boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])

    def loss(f, b):
        return roi_align(f, b, jnp.zeros(1, jnp.int32), 3).sum()

    gf, gb = jax.grad(loss, argnums=(0, 1))(feat, boxes)
    assert float(jnp.abs(gf).sum()) > 0
    assert gf.shape == feat.shape
    assert float(jnp.abs(gb).sum()) > 0


def test_roi_align_jit_and_channels():
    feat = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 8).astype(np.float32))
    boxes = jnp.asarray(np.random.RandomState(3).rand(10, 4).astype(np.float32) * 10)
    boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + boxes[:, 2:] + 1], axis=1)
    bidx = jnp.asarray(np.random.RandomState(4).randint(0, 2, 10), jnp.int32)
    f = jax.jit(lambda a, b, c: roi_align(a, b, c, 7, spatial_scale=0.25))
    out = f(feat, boxes, bidx)
    assert out.shape == (10, 7, 7, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_hybrid_backward_transpose_matches_vjp():
    """The hand-written transpose scatter (_roi_align_ml_transpose) must equal
    jax.vjp of the XLA formulation — it replaces the vjp in the train path to
    avoid re-running the gather forward inside the backward."""
    import importlib

    ra = importlib.import_module("detectron2_tpu.ops.roi_align")

    rng = np.random.RandomState(0)
    C = 16
    feats = {
        "0": jnp.asarray(rng.rand(2, 32, 48, C).astype(np.float32)),
        "1": jnp.asarray(rng.rand(2, 16, 24, C).astype(np.float32)),
    }
    for R, out_size in [(24, (7, 7)), (700, (14, 14))]:
        xy = rng.rand(R, 2) * 100
        wh = rng.rand(R, 2) * 60 + 8
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
        boxes = boxes.at[0].set(jnp.asarray([-30.0, -30.0, 10.0, 10.0]))
        bidx = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
        lvl = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
        g = jnp.asarray(rng.rand(R, *out_size, C).astype(np.float32))
        args = (boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), out_size)

        _, vjp = jax.vjp(lambda f: ra._roi_align_multilevel_xla(f, *args, 2, True), feats)
        (d_ref,) = vjp(g)
        d_trans = ra._roi_align_ml_transpose(
            g, feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), out_size, 2
        )
        for k in feats:
            np.testing.assert_allclose(
                np.asarray(d_trans[k]), np.asarray(d_ref[k]), rtol=1e-3, atol=1e-3
            )


def test_windowed_transpose_adjoint_of_pallas_forward():
    """_roi_align_ml_transpose_window must (a) equal the exact transpose for
    unclamped boxes and (b) satisfy the adjoint identity <fwd(f), g> ==
    <f, bwd(g)> against the Pallas forward — clamping included — since it
    shares the kernel's _precompute geometry."""
    import functools
    import importlib

    from jax.experimental import pallas as pl

    import detectron2_tpu.ops.pallas.roi_align_pallas as rap

    ra = importlib.import_module("detectron2_tpu.ops.roi_align")

    rng = np.random.RandomState(0)
    C = 16
    feats = {
        "0": jnp.asarray(rng.rand(2, 32, 48, C).astype(np.float32)),
        "1": jnp.asarray(rng.rand(2, 16, 24, C).astype(np.float32)),
    }
    R = 24
    xy = rng.rand(R, 2) * 100
    wh = rng.rand(R, 2) * 50 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
    lvl = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
    g = jnp.asarray(rng.rand(R, 7, 7, C).astype(np.float32))
    args = (boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7), 2)

    d_exact = ra._roi_align_ml_transpose(g, feats, *args)
    d_win = ra._roi_align_ml_transpose_window(g, feats, *args)
    for k in feats:
        np.testing.assert_allclose(
            np.asarray(d_win[k]), np.asarray(d_exact[k]), rtol=1e-4, atol=1e-4
        )

    # adjoint identity vs the pallas forward in interpret mode (incl. clamped giants)
    xy = rng.rand(R, 2) * 80
    wh = rng.rand(R, 2) * 120 + 8
    boxes2 = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        out = rap.roi_align_pallas_multilevel(
            feats, boxes2, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7), sampling_ratio=2
        )
    finally:
        pl.pallas_call = orig
    lhs = float((out * g).sum())
    d = ra._roi_align_ml_transpose_window(
        g, feats, boxes2, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7), 2
    )
    rhs = float(sum((feats[k] * d[k]).sum() for k in feats))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


class TestRoiAlignSeparable:
    """roi_align_separable (two batched matmuls over single-channel maps)
    must match the gather formulation's values — same sample coordinates,
    same border rule; only the interpolation summation order differs."""

    def _compare(self, maps, boxes, idx, out_size, sampling_ratio):
        from detectron2_tpu.ops.roi_align import roi_align, roi_align_separable

        ref = roi_align(
            jnp.asarray(maps)[..., None],
            jnp.asarray(boxes),
            jnp.asarray(idx, jnp.int32),
            output_size=out_size,
            spatial_scale=1.0,
            sampling_ratio=sampling_ratio,
            aligned=True,
        )[..., 0]
        out = roi_align_separable(
            jnp.asarray(maps),
            jnp.asarray(boxes),
            jnp.asarray(idx, jnp.int32),
            output_size=out_size,
            sampling_ratio=sampling_ratio,
            aligned=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matches_gather_formulation(self):
        rng = np.random.RandomState(0)
        N, Ms = 6, 28
        maps = rng.rand(N, Ms, Ms).astype(np.float32)
        R = 40
        xy = rng.rand(R, 2) * 20
        wh = rng.rand(R, 2) * 25 + 0.5
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        idx = rng.randint(0, N, R)
        self._compare(maps, boxes, idx, (28, 28), 2)

    def test_border_and_degenerate_boxes(self):
        rng = np.random.RandomState(1)
        maps = rng.rand(3, 16, 16).astype(np.float32)
        boxes = np.array(
            [
                [-10.0, -10.0, 5.0, 5.0],  # partially outside (negative)
                [10.0, 10.0, 30.0, 30.0],  # overflows the map
                [4.0, 4.0, 4.0, 4.0],      # zero-size
                [-30.0, -30.0, -20.0, -20.0],  # fully outside -> zeros
                [0.0, 0.0, 16.0, 16.0],    # exact full map
            ],
            np.float32,
        )
        idx = np.array([0, 1, 2, 0, 1])
        self._compare(maps, boxes, idx, (7, 7), 2)

    def test_sampling_ratio_zero_default(self):
        rng = np.random.RandomState(2)
        maps = rng.rand(2, 28, 28).astype(np.float32)
        boxes = np.array([[2.0, 3.0, 20.0, 25.0], [0.5, 0.5, 27.5, 27.5]], np.float32)
        self._compare(maps, boxes, np.array([1, 0]), (14, 14), 0)

    def test_gradients_flow_to_maps(self):
        from detectron2_tpu.ops.roi_align import roi_align_separable

        rng = np.random.RandomState(3)
        maps = jnp.asarray(rng.rand(2, 12, 12).astype(np.float32))
        boxes = jnp.asarray([[1.0, 1.0, 10.0, 10.0]], jnp.float32)

        def f(m):
            return roi_align_separable(m, boxes, jnp.zeros(1, jnp.int32), (7, 7), 2).sum()

        g = jax.grad(f)(maps)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g[0]).sum()) > 0
        assert float(jnp.abs(g[1]).sum()) == 0  # untouched map gets no grad


class TestRoiAlignSeparableChan:
    """roi_align_separable_chan (the DensePose decoder pool: multi-channel
    map, K rois per image, bin mean folded into the weight matrices) must
    match the gather formulation for both grids — exact at any box size,
    including boxes far beyond any DMA-window footprint."""

    def _compare(self, feats, boxes_bk, out_size, scale, sr, aligned):
        from detectron2_tpu.ops.roi_align import roi_align, roi_align_separable_chan

        B, K = boxes_bk.shape[:2]
        ref = roi_align(
            jnp.asarray(feats),
            jnp.asarray(boxes_bk.reshape(B * K, 4)),
            jnp.repeat(jnp.arange(B, dtype=jnp.int32), K),
            output_size=out_size,
            spatial_scale=scale,
            sampling_ratio=sr,
            aligned=aligned,
        )
        out = roi_align_separable_chan(
            jnp.asarray(feats),
            jnp.asarray(boxes_bk),
            out_size,
            spatial_scale=scale,
            sampling_ratio=sr,
            aligned=aligned,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(B * K, *out_size, -1),
            np.asarray(ref),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_matches_gather_both_grids(self):
        rng = np.random.RandomState(0)
        feats = rng.rand(2, 50, 84, 8).astype(np.float32)
        # stride-4-style: boxes in image coords up to 4x map size, incl. a
        # giant (full-image) box and a sub-pixel one (v1 clamp)
        boxes = np.zeros((2, 5, 4), np.float32)
        xy = rng.rand(2, 5, 2) * 150
        wh = rng.rand(2, 5, 2) * 150 + 8
        boxes[..., :2] = xy
        boxes[..., 2:] = xy + wh
        boxes[0, 0] = [0, 0, 336, 200]        # full image
        boxes[1, 1] = [40.0, 40.0, 40.5, 40.2]  # sub-pixel
        for aligned in (True, False):
            self._compare(feats, boxes, (28, 28), 0.25, 2, aligned)

    def test_gradients_flow(self):
        from detectron2_tpu.ops.roi_align import roi_align_separable_chan

        rng = np.random.RandomState(3)
        feats = jnp.asarray(rng.rand(1, 20, 20, 4).astype(np.float32))
        boxes = jnp.asarray([[[4.0, 4.0, 60.0, 60.0]]], jnp.float32)

        def f(m):
            return roi_align_separable_chan(m, boxes, (7, 7), 0.25, 2, False).sum()

        g = jax.grad(f)(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
