"""swap_align2nat
(reference projects/TensorMask/tensormask/layers/swap_align2nat.py and the
CUDA kernel csrc/SwapAlign2Nat/SwapAlign2Nat_cuda.cu).

Converts sliding-window mask predictions from the *aligned* representation
(each location's [V, U] window described in its own frame, coarse spatial
grid) to the *natural* representation (fine [V*λ, U*λ] window on a λ×-coarser
grid): output[n, v, u, y, x] quadrilinearly samples input at

    oy = y·λ + v − (V·λ)/2 + 0.5      (input H axis)
    ox = x·λ + u − (U·λ)/2 + 0.5      (input W axis)
    ov = (v + 0.5)/λ − 0.5            (input V axis)
    ou = (u + 0.5)/λ − 0.5            (input U axis)

with ``pad_val`` outside the tensor (sigmoid(-6) ≈ 0 → "no mask"). On TPU
this is a 16-tap fused gather — one XLA program, no custom kernel needed,
and trivially differentiable (the reference needed a hand-written backward).
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["swap_align2nat", "SwapAlign2Nat"]


def swap_align2nat(
    x: jnp.ndarray, lambda_val: int, pad_val: float = -6.0, vu_shape: Tuple[int, int] = None
) -> jnp.ndarray:
    """
    Args:
        x: [N, H, W, V*U] aligned mask predictions (NHWC; the reference is
            NCHW [N, V*U, H, W]).
        lambda_val: unit-length ratio λ >= 1.
        vu_shape: (V, U); defaults to a square window V = U = sqrt(C).
    Returns:
        [N, ceil(H/λ), ceil(W/λ), (V*λ)*(U*λ)] natural mask predictions
        (ceil matches the reference kernel wrapper,
        SwapAlign2Nat_cuda.cu:427-428).
    """
    N, H, W, C = x.shape
    if vu_shape is None:
        V = U = int(round(C**0.5))
    else:
        V, U = vu_shape
    assert V * U == C, (V, U, C)
    lam = int(lambda_val)
    Vo, Uo, Ho, Wo = V * lam, U * lam, -(-H // lam), -(-W // lam)

    xg = x.reshape(N, H, W, V, U)

    # fractional input coordinates per output (v, u, y, x)
    v = jnp.arange(Vo, dtype=jnp.float32)
    u = jnp.arange(Uo, dtype=jnp.float32)
    yy = jnp.arange(Ho, dtype=jnp.float32)
    xx = jnp.arange(Wo, dtype=jnp.float32)
    oy = yy[None, :, None] * lam + v[:, None, None] - Vo / 2 + 0.5  # [Vo, Ho, 1]->broadcast
    ox = xx[None, :, None] * lam + u[:, None, None] - Uo / 2 + 0.5  # [Uo, Wo, 1]
    ov = (v + 0.5) / lam - 0.5  # [Vo]
    ou = (u + 0.5) / lam - 0.5  # [Uo]

    def taps(coord, size):
        f = jnp.floor(coord)
        wc = coord - f
        return f.astype(jnp.int32), f.astype(jnp.int32) + 1, 1.0 - wc, wc

    oyf, oyc, oywf, oywc = taps(oy[..., 0], H)  # [Vo, Ho]
    oxf, oxc, oxwf, oxwc = taps(ox[..., 0], W)  # [Uo, Wo]
    ovf, ovc, ovwf, ovwc = taps(ov, V)  # [Vo]
    ouf, ouc, ouwf, ouwc = taps(ou, U)  # [Uo]

    def read(yi, xi, vi, ui):
        """yi:[Vo,Ho] xi:[Uo,Wo] vi:[Vo] ui:[Uo] -> [N, Vo, Uo, Ho, Wo]."""
        ok = (
            ((yi >= 0) & (yi < H))[:, None, :, None]
            & ((xi >= 0) & (xi < W))[None, :, None, :]
            & ((vi >= 0) & (vi < V))[:, None, None, None]
            & ((ui >= 0) & (ui < U))[None, :, None, None]
        )  # [Vo, Uo, Ho, Wo]
        yc_ = jnp.clip(yi, 0, H - 1)[:, None, :, None]
        xc_ = jnp.clip(xi, 0, W - 1)[None, :, None, :]
        vc_ = jnp.clip(vi, 0, V - 1)[:, None, None, None]
        uc_ = jnp.clip(ui, 0, U - 1)[None, :, None, None]
        yb, xb, vb, ub = jnp.broadcast_arrays(yc_, xc_, vc_, uc_)
        vals = xg[:, yb, xb, vb, ub]  # [N, Vo, Uo, Ho, Wo]
        return jnp.where(ok[None], vals, pad_val)

    out = jnp.zeros((N, Vo, Uo, Ho, Wo), x.dtype)
    for yi, yw in ((oyf, oywf), (oyc, oywc)):
        for xi, xw in ((oxf, oxwf), (oxc, oxwc)):
            for vi, vw in ((ovf, ovwf), (ovc, ovwc)):
                for ui, uw in ((ouf, ouwf), (ouc, ouwc)):
                    w = (
                        yw[:, None, :, None]
                        * xw[None, :, None, :]
                        * vw[:, None, None, None]
                        * uw[None, :, None, None]
                    )
                    out = out + w[None].astype(x.dtype) * read(yi, xi, vi, ui)

    return out.transpose(0, 3, 4, 1, 2).reshape(N, Ho, Wo, Vo * Uo)


class SwapAlign2Nat(nn.Module):
    """Module wrapper (reference swap_align2nat.py:SwapAlign2Nat)."""

    lambda_val: int
    pad_val: float = -6.0

    def __call__(self, x):
        return swap_align2nat(x, self.lambda_val, self.pad_val)
