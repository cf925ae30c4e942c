"""Pallas RoIAlign backward vs the tested XLA windowed transpose
(interpret mode on CPU). With matching window dims the two are the same
adjoint of the Pallas forward, so they must agree to float tolerance."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


def _setup(seed=0, R=24, C=16, B=2):
    rng = np.random.RandomState(seed)
    shapes = [(B, 64, 80, C), (B, 32, 40, C), (B, 16, 20, C), (B, 8, 10, C)]
    features = {
        f"p{i+2}": jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for i, s in enumerate(shapes)
    }
    level_order = ("p2", "p3", "p4", "p5")
    scales = (0.25, 0.125, 0.0625, 0.03125)
    cx = rng.uniform(30, 220, R)
    cy = rng.uniform(30, 220, R)
    half = rng.uniform(4, 100, (2, R))
    boxes = jnp.asarray(
        np.stack([cx - half[0], cy - half[1], cx + half[0], cy + half[1]], axis=1).astype(
            np.float32
        )
    )
    batch_idx = jnp.asarray(rng.randint(0, B, R), jnp.int32)
    from detectron2_tpu.modeling.poolers import assign_boxes_to_levels

    levels = assign_boxes_to_levels(boxes, 2, 5)
    return features, boxes, batch_idx, levels, level_order, scales


@pytest.mark.parametrize("out_size", [7, 14])
def test_bwd_matches_xla_transpose(out_size):
    from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_backward
    from detectron2_tpu.ops.roi_align import _roi_align_ml_transpose_window

    features, boxes, batch_idx, levels, level_order, scales = _setup()
    rng = np.random.RandomState(1)
    g = jnp.asarray(
        rng.standard_normal((boxes.shape[0], out_size, out_size, 16)).astype(np.float32)
    )

    ours = roi_align_pallas_backward(
        g, features, boxes, batch_idx, levels, level_order, scales, out_size, 2
    )
    ref = _roi_align_ml_transpose_window(
        g, features, boxes, batch_idx, levels, level_order, scales, (out_size, out_size), 2
    )
    for name in level_order:
        a, b = np.asarray(ours[name]), np.asarray(ref[name])
        assert a.shape == b.shape, name
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_bwd_adjoint_identity():
    """<RoIAlign(f), g> == <f, RoIAlign^T(g)> — the dot-product adjoint test
    against the Pallas FORWARD itself (both at the same window geometry)."""
    from detectron2_tpu.ops.pallas.roi_align_pallas import (
        roi_align_pallas_backward,
        roi_align_pallas_multilevel,
    )

    features, boxes, batch_idx, levels, level_order, scales = _setup(seed=3, R=16)
    rng = np.random.RandomState(2)
    out = roi_align_pallas_multilevel(
        features, boxes, batch_idx, levels, level_order, scales, (7, 7), 2
    )
    g = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    grads = roi_align_pallas_backward(
        g, features, boxes, batch_idx, levels, level_order, scales, (7, 7), 2
    )
    lhs = float(jnp.vdot(out, g))
    rhs = float(
        sum(jnp.vdot(features[n], grads[n]) for n in level_order)
    )
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs)), (lhs, rhs)


def test_bwd_zero_grad_gives_zero():
    from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_backward

    features, boxes, batch_idx, levels, level_order, scales = _setup(seed=5, R=8)
    g = jnp.zeros((8, 7, 7, 16), jnp.float32)
    grads = roi_align_pallas_backward(
        g, features, boxes, batch_idx, levels, level_order, scales, 7, 2
    )
    for name in level_order:
        assert float(jnp.abs(grads[name]).max()) == 0.0


def test_bwd_aligned_false_matches_vjp():
    """aligned=False backward (v1 grid, DensePose poolers) vs jax.vjp of the
    XLA forward with the same flag — exact adjoint within window coverage."""
    from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_backward
    from detectron2_tpu.ops.roi_align import _roi_align_multilevel_xla

    features, boxes, batch_idx, levels, level_order, scales = _setup(R=16)
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.standard_normal((16, 7, 7, 16)).astype(np.float32))

    ours = roi_align_pallas_backward(
        g, features, boxes, batch_idx, levels, level_order, scales, 7, 2, aligned=False
    )
    _, vjp = jax.vjp(
        lambda f: _roi_align_multilevel_xla(
            f, boxes, batch_idx, levels, level_order, scales, (7, 7), 2, False
        ),
        features,
    )
    (ref,) = vjp(g)
    for n in level_order:
        np.testing.assert_allclose(
            np.asarray(ours[n]), np.asarray(ref[n]), rtol=1e-4, atol=1e-4
        )
