import numpy as np
import pytest

import jax.numpy as jnp

from detectron2_tpu.modeling.box_regression import (
    Box2BoxTransform,
    Box2BoxTransformLinear,
    Box2BoxTransformRotated,
)


def random_boxes(n, scale=100, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * scale * 0.5 + 2
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_invertibility():
    """get_deltas followed by apply_deltas recovers the target boxes
    (reference tests/modeling/test_box2box_transform.py semantics)."""
    t = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    src = jnp.asarray(random_boxes(20, seed=1))
    dst = jnp.asarray(random_boxes(20, seed=2))
    deltas = t.get_deltas(src, dst)
    back = t.apply_deltas(deltas, src)
    # fp32 log/exp roundtrip: ~1e-4 relative on ~100px coordinates
    np.testing.assert_allclose(np.asarray(back), np.asarray(dst), rtol=1e-3, atol=2e-2)


def test_apply_deltas_multiclass():
    t = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    src = jnp.asarray(random_boxes(5))
    deltas = jnp.asarray(np.random.RandomState(0).randn(5, 12).astype(np.float32) * 0.1)
    out = t.apply_deltas(deltas, src)
    assert out.shape == (5, 12)


def test_scale_clamp():
    t = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    src = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])  # insane dw/dh
    out = np.asarray(t.apply_deltas(deltas, src))
    assert np.isfinite(out).all()
    assert (out[:, 2] - out[:, 0]) < 10 * 1000 / 16 * 1.01


def test_rotated_invertibility():
    t = Box2BoxTransformRotated(weights=(10.0, 10.0, 5.0, 5.0, 1.0))
    rng = np.random.RandomState(3)
    src = np.column_stack(
        [rng.rand(10) * 100, rng.rand(10) * 100, rng.rand(10) * 40 + 2, rng.rand(10) * 40 + 2, rng.rand(10) * 360 - 180]
    ).astype(np.float32)
    dst = np.column_stack(
        [rng.rand(10) * 100, rng.rand(10) * 100, rng.rand(10) * 40 + 2, rng.rand(10) * 40 + 2, rng.rand(10) * 170 - 85]
    ).astype(np.float32)
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(dst))
    back = np.asarray(t.apply_deltas(deltas, jnp.asarray(src)))
    np.testing.assert_allclose(back[:, :4], dst[:, :4], atol=1e-2)
    # angles equal mod 360
    da = (back[:, 4] - dst[:, 4] + 180) % 360 - 180
    np.testing.assert_allclose(da, 0, atol=1e-2)


def test_linear_invertibility():
    t = Box2BoxTransformLinear()
    src = jnp.asarray(random_boxes(10, seed=4))
    dst_np = random_boxes(10, seed=5)
    # linear transform requires the src center inside dst; build dst around src centers
    src_np = np.asarray(src)
    ctr = (src_np[:, :2] + src_np[:, 2:]) / 2
    dst_np = np.concatenate([ctr - 10, ctr + 15], axis=1).astype(np.float32)
    deltas = t.get_deltas(src, jnp.asarray(dst_np))
    back = np.asarray(t.apply_deltas(deltas, src))
    np.testing.assert_allclose(back, dst_np, atol=1e-3)
