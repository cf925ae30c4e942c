"""DeformConv / ModulatedDeformConv flax modules.

Parity with reference detectron2/layers/deform_conv.py:316-514 (the module
wrappers over the CUDA autograd functions). The compute is the XLA-native
gather→im2col→MXU formulation in ops/deform_conv.py; offsets (and masks for
the modulated variant) are produced by the caller, as in the reference.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.ops.deform_conv import deform_conv2d

__all__ = ["DeformConv", "ModulatedDeformConv"]


class DeformConv(nn.Module):
    """Deformable convolution v1 (NHWC)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = False
    norm: Optional[nn.Module] = None
    activation: Optional[object] = None

    @nn.compact
    def __call__(self, x, offset, train: bool = False):
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, self.in_channels // self.groups, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        out = deform_conv2d(
            x,
            offset,
            weight.astype(x.dtype),
            mask=None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            deformable_groups=self.deformable_groups,
            bias=bias,
        )
        if self.norm is not None:
            out = self.norm(out, train=train)
        if self.activation is not None:
            out = self.activation(out)
        return out


class ModulatedDeformConv(nn.Module):
    """Deformable convolution v2 (with modulation masks), NHWC."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    norm: Optional[nn.Module] = None
    activation: Optional[object] = None

    @nn.compact
    def __call__(self, x, offset, mask, train: bool = False):
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, self.in_channels // self.groups, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        out = deform_conv2d(
            x,
            offset,
            weight.astype(x.dtype),
            mask=mask,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            deformable_groups=self.deformable_groups,
            bias=bias,
        )
        if self.norm is not None:
            out = self.norm(out, train=train)
        if self.activation is not None:
            out = self.activation(out)
        return out
