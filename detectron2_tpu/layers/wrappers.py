"""Conv wrapper and small tensor helpers.

The reference's wrappers.py is mostly torch tracing/scripting shims that have
no jax equivalent; what survives is the Conv2d-with-fused-norm/activation
pattern (reference layers/wrappers.py:102-156) — here a flax module in NHWC —
plus `cat`, `shapes_to_tensor`, `nonzero_tuple` for API parity.
"""

from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Conv2d", "ConvTranspose2d", "cat", "shapes_to_tensor", "nonzero_tuple", "move_device_like"]


class Conv2d(nn.Module):
    """Conv (NHWC) with optional fused norm and activation.

    Weight layout is HWIO (flax). The checkpoint converter maps torch OIHW
    weights into this layout.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[nn.Module] = None
    activation: Optional[Callable] = None
    bias_init_value: Optional[float] = None  # e.g. focal-loss prior-prob bias
    kernel_init_std: Optional[float] = None  # normal(std) init (dense-head convention)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        st = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 2
        dl = self.dilation if isinstance(self.dilation, tuple) else (self.dilation,) * 2
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            p = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2
            pad = [(p[0], p[0]), (p[1], p[1])]

        y = nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=pad,
            kernel_dilation=dl,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=x.dtype,
            kernel_init=(
                nn.initializers.normal(self.kernel_init_std)
                if self.kernel_init_std is not None
                else nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
            ),
            bias_init=(
                nn.initializers.constant(self.bias_init_value)
                if self.bias_init_value is not None
                else nn.initializers.zeros
            ),
        )(x)
        if self.norm is not None:
            # get_norm returns a factory: instantiate INSIDE this scope so the
            # params land at <conv_name>/norm (the reference's convN.norm);
            # module instances are still accepted for back-compat
            norm = self.norm if isinstance(self.norm, nn.Module) else self.norm(name="norm")
            y = norm(y, train=train)
        if self.activation is not None:
            y = self.activation(y)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed conv (NHWC) matching torch's ConvTranspose2d geometry.

    Default padding picks the torch equivalence for the two common cases:
    k==s (torch padding 0, exact k-fold upsample) -> "VALID"; k!=s (torch
    padding k/2-1, e.g. k=4/s=2) -> "SAME" (verified bit-exact vs torch).
    For torch padding=0 with k!=s (out = (in-1)*s + k, e.g. HRFPN's interp
    convs) pass an explicit per-dim padding ((k-1, k-1),)*2 — flax "VALID"
    diverges when s > k."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    use_bias: bool = True
    activation: Optional[Callable] = None
    padding: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        st = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 2
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=self.padding or ("VALID" if ks == st else "SAME"),
            use_bias=self.use_bias,
            dtype=x.dtype,
        )(x)
        if self.activation is not None:
            y = self.activation(y)
        return y


def cat(tensors: Sequence[jnp.ndarray], axis: int = 0) -> jnp.ndarray:
    """Concatenate; single-element lists pass through (reference wrappers.py:65)."""
    assert isinstance(tensors, (list, tuple))
    if len(tensors) == 1:
        return tensors[0]
    return jnp.concatenate(tensors, axis=axis)


def shapes_to_tensor(x: List[int]) -> jnp.ndarray:
    """Turn a list of integer scalars into an int array (reference wrappers.py:20)."""
    return jnp.asarray(x, dtype=jnp.int32)


def nonzero_tuple(x):
    """np.nonzero-like helper (reference wrappers.py:158). Host-side only —
    produces data-dependent shapes."""
    return np.nonzero(np.asarray(x))


def move_device_like(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Device placement follows jax sharding; kept for API parity."""
    return src
