"""swap_align2nat vs a direct (slow) numpy transcription of the op's math."""

import numpy as np

import jax.numpy as jnp

from detectron2_tpu.projects.tensormask import swap_align2nat


def _naive(x, lam, pad_val=-6.0):
    """x: [N, H, W, V*U] -> [N, H/lam, W/lam, V*lam * U*lam] per the kernel's
    quadrilinear formula."""
    N, H, W, C = x.shape
    V = U = int(round(C**0.5))
    xg = x.reshape(N, H, W, V, U)
    Vo, Uo, Ho, Wo = V * lam, U * lam, H // lam, W // lam

    def get(n, y, xx, v, u):
        if 0 <= y < H and 0 <= xx < W and 0 <= v < V and 0 <= u < U:
            return xg[n, y, xx, v, u]
        return pad_val

    out = np.zeros((N, Ho, Wo, Vo, Uo), np.float64)
    for n in range(N):
        for v in range(Vo):
            for u in range(Uo):
                for y in range(Ho):
                    for xx in range(Wo):
                        oy = y * lam + v - Vo / 2 + 0.5
                        ox = xx * lam + u - Uo / 2 + 0.5
                        ov = (v + 0.5) / lam - 0.5
                        ou = (u + 0.5) / lam - 0.5
                        yf, xf = int(np.floor(oy)), int(np.floor(ox))
                        vf, uf = int(np.floor(ov)), int(np.floor(ou))
                        ywc, xwc = oy - yf, ox - xf
                        vwc, uwc = ov - vf, ou - uf
                        acc = 0.0
                        for yi, yw in ((yf, 1 - ywc), (yf + 1, ywc)):
                            for xi, xw in ((xf, 1 - xwc), (xf + 1, xwc)):
                                for vi, vw in ((vf, 1 - vwc), (vf + 1, vwc)):
                                    for ui, uw in ((uf, 1 - uwc), (uf + 1, uwc)):
                                        acc += yw * xw * vw * uw * get(n, yi, xi, vi, ui)
                        out[n, y, xx, v, u] = acc
    return out.reshape(N, Ho, Wo, Vo * Uo)


def test_swap_align2nat_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 9).astype(np.float32)  # V=U=3, lam=2
    got = np.asarray(swap_align2nat(jnp.asarray(x), 2))
    want = _naive(x.astype(np.float64), 2)
    assert got.shape == (1, 2, 2, 36)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_swap_align2nat_identity_lambda1():
    """λ=1: pure align->nat shift; shapes preserved, finite output."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 6, 25).astype(np.float32)
    y = np.asarray(swap_align2nat(jnp.asarray(x), 1))
    assert y.shape == (2, 6, 6, 25)
    want = _naive(x.astype(np.float64), 1)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)
