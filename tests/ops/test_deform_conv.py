"""Deformable conv v1/v2 vs an independent numpy reference (the role of the
reference's tests/layers/test_deformable.py, which checks exact forward values
and gradients against the CUDA op)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.deform_conv import deform_conv2d


def _np_deform_conv(x, offset, weight, mask=None, stride=1, padding=1, dilation=1):
    """Slow direct reimplementation (v2 semantics when mask is given):
    out[b, ho, wo, o] = sum_{i,j,c} w[i,j,c,o] * m[b,ho,wo,ij]
        * bilinear(x[b], ho*s - p + i*d + dy, wo*s - p + j*d + dx, c)
    with zero padding outside the image (matching the torch op)."""
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def bil(b, y, x_, c):
        if y <= -1 or y >= H or x_ <= -1 or x_ >= W:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        fy, fx = y - y0, x_ - x0
        v = 0.0
        for dy_, wy in ((0, 1 - fy), (1, fy)):
            for dx_, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy_, x0 + dx_
                if 0 <= yy < H and 0 <= xx < W and wy * wx != 0:
                    v += wy * wx * x[b, yy, xx, c]
        return v

    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                for i in range(kh):
                    for j in range(kw):
                        t = i * kw + j
                        dy = offset[b, ho, wo, 2 * t]
                        dx = offset[b, ho, wo, 2 * t + 1]
                        m = 1.0 if mask is None else mask[b, ho, wo, t]
                        y = ho * stride - padding + i * dilation + dy
                        x_ = wo * stride - padding + j * dilation + dx
                        for c in range(C):
                            val = bil(b, y, x_, c)
                            out[b, ho, wo] += weight[i, j, c] * (val * m)
    return out


@pytest.mark.parametrize("with_mask", [False, True])
def test_deform_conv_matches_numpy(with_mask):
    rng = np.random.RandomState(0)
    B, H, W, C, Cout = 1, 6, 7, 3, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    weight = rng.randn(3, 3, C, Cout).astype(np.float32) * 0.2
    offset = (rng.randn(B, H, W, 18) * 1.5).astype(np.float32)
    mask = rng.rand(B, H, W, 9).astype(np.float32) if with_mask else None

    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x),
            jnp.asarray(offset),
            jnp.asarray(weight),
            mask=None if mask is None else jnp.asarray(mask),
        )
    )
    want = _np_deform_conv(x, offset, weight, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offsets_is_conv():
    """With zero offsets and no mask, it must equal a plain conv."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32) * 0.2
    off = np.zeros((1, 8, 8, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w)))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_deform_conv_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 5, 5, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32) * 0.3)
    off = jnp.asarray((rng.randn(1, 5, 5, 18) * 0.7).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, 5, 5, 9).astype(np.float32))

    def loss(x, off, w, mask):
        return (deform_conv2d(x, off, w, mask=mask) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, w, mask)
    for name, g in zip(("x", "offset", "weight", "mask"), grads):
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert np.abs(g).sum() > 0, f"zero grad for {name}"

    # finite-difference check on a single offset coordinate
    eps = 1e-3
    d = np.zeros(off.shape, np.float32)
    d[0, 2, 2, 4] = eps
    f0 = float(loss(x, off - jnp.asarray(d), w, mask))
    f1 = float(loss(x, off + jnp.asarray(d), w, mask))
    fd = (f1 - f0) / (2 * eps)
    an = float(np.asarray(grads[1])[0, 2, 2, 4])
    np.testing.assert_allclose(an, fd, rtol=5e-2, atol=5e-2)
