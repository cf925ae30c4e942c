"""ASPP: atrous spatial pyramid pooling (reference detectron2/layers/aspp.py:14),
used by the DeepLab family heads."""

from typing import Callable, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.wrappers import Conv2d

__all__ = ["ASPP"]


class ASPP(nn.Module):
    """Parallel branches: 1x1 conv, three 3x3 atrous convs, and global
    average pooling; concatenated and projected."""

    in_channels: int
    out_channels: int
    dilations: tuple = (6, 12, 18)
    norm: str = ""
    activation: Optional[Callable] = nn.relu
    pool_kernel_size: Optional[tuple] = None
    dropout: float = 0.0
    # Panoptic-DeepLab variant: the 3x3 atrous branches become
    # depthwise-separable convs (reference aspp.py:75-88)
    use_depthwise_separable_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.dilations) == 3, "ASPP expects 3 dilations"
        branches = []
        branches.append(
            Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=not self.norm,
                norm=get_norm(self.norm, self.out_channels),
                activation=self.activation,
                name="conv1x1",
            )(x, train=train)
        )
        for i, d in enumerate(self.dilations):
            if self.use_depthwise_separable_conv:
                from detectron2_tpu.layers.blocks import DepthwiseSeparableConv2d

                branches.append(
                    DepthwiseSeparableConv2d(
                        in_channels=self.in_channels,
                        out_channels=self.out_channels,
                        kernel_size=3,
                        padding=d,
                        dilation=d,
                        norm1=self.norm,
                        activation1=self.activation,
                        norm2=self.norm,
                        activation2=self.activation,
                        name=f"atrous{i}",
                    )(x, train=train)
                )
                continue
            branches.append(
                Conv2d(
                    features=self.out_channels,
                    kernel_size=3,
                    padding=d,
                    dilation=d,
                    use_bias=not self.norm,
                    norm=get_norm(self.norm, self.out_channels),
                    activation=self.activation,
                    name=f"atrous{i}",
                )(x, train=train)
            )

        # image pooling branch
        if self.pool_kernel_size is None:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            kh, kw = self.pool_kernel_size
            pooled = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
        pooled = Conv2d(
            features=self.out_channels, kernel_size=1, use_bias=True, activation=self.activation, name="pool_conv"
        )(pooled, train=train)
        pooled = jnp.broadcast_to(
            pooled.mean(axis=(1, 2), keepdims=True), branches[0].shape
        ) if self.pool_kernel_size else jnp.broadcast_to(pooled, branches[0].shape)
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=not self.norm,
            norm=get_norm(self.norm, self.out_channels),
            activation=self.activation,
            name="project",
        )(y, train=train)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        return y
