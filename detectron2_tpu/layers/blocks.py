"""CNN building blocks (reference detectron2/layers/blocks.py).

"Freezing" in this functional framework is expressed with
``jax.lax.stop_gradient`` on a block's output (plus FrozenBN), not by toggling
requires_grad: a frozen block's parameters receive zero gradient and stay
fixed under any gradient-based optimizer.
"""

from typing import Callable, Optional

import jax
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.wrappers import Conv2d

__all__ = ["CNNBlockBase", "DepthwiseSeparableConv2d", "DropPath"]


class DropPath(nn.Module):
    """Stochastic depth: drop a residual branch per SAMPLE with probability
    ``rate`` at train time, rescaling survivors by 1/keep (the timm
    ``DropPath`` the reference's ViT/Swin/MViT blocks wrap their residuals
    in; reference vit.py:288-292). Identity when deterministic or rate=0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jax.numpy.where(mask, x / keep, 0.0).astype(x.dtype)


class CNNBlockBase(nn.Module):
    """A CNN block with in_channels/out_channels/stride attributes — the
    interface ResNet-style backbones compose (reference blocks.py:16-55)."""

    in_channels: int = 0
    out_channels: int = 0
    stride: int = 1
    freeze_block: bool = False

    def maybe_freeze(self, x):
        return jax.lax.stop_gradient(x) if self.freeze_block else x


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise separable conv: depthwise 3x3 + pointwise 1x1, each with
    optional norm/activation (reference blocks.py:58-111)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    norm1: Optional[str] = None
    activation1: Optional[Callable] = None
    norm2: Optional[str] = None
    activation2: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(
            features=self.in_channels,
            kernel_size=self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.in_channels,
            use_bias=self.norm1 is None,
            norm=get_norm(self.norm1, self.in_channels),
            activation=self.activation1,
            name="depthwise",
        )(x, train=train)
        x = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=self.norm2 is None,
            norm=get_norm(self.norm2, self.out_channels),
            activation=self.activation2,
            name="pointwise",
        )(x, train=train)
        return x
