"""Coarse mask head (reference projects/PointRend/point_rend/mask_head.py
ConvFCHead, _version 2): given point-pooled per-roi features it reduces
channels (1x1 conv, only when in_channels > conv_dim) and spatial dims (2x2
stride-2 conv), then FC layers predict a low-resolution (7x7) per-class mask
that the point head subsequently refines."""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.roi_heads.mask_head import ROI_MASK_HEAD_REGISTRY

__all__ = ["CoarseMaskHead", "ImplicitParameterHead"]


class ImplicitParameterHead(nn.Module):
    """The reference's ConvFCHead with a FLAT output shape — predicts the
    per-instance MLP parameter vector for Implicit PointRend
    (reference mask_head.py ConvFCHead(output_shape=(num_params,)) at :368).
    Layer names mirror CoarseMaskHead for checkpoint mapping."""

    num_params: int
    conv_dim: int = 256
    fc_dims: Tuple[int, ...] = (1024, 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] pooled features -> [R, num_params]."""
        R = x.shape[0]
        if x.shape[-1] > self.conv_dim:
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=1,
                activation=nn.relu,
                name="reduce_channel_dim_conv",
            )(x, train=train)
        x = Conv2d(
            features=self.conv_dim,
            kernel_size=2,
            strides=2,
            padding=0,
            activation=nn.relu,
            name="reduce_spatial_dim_conv",
        )(x, train=train)
        x = x.transpose(0, 3, 1, 2).reshape(R, -1)  # torch CHW flatten
        for i, dim in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(dim, name=f"fc{i + 1}")(x))
        return nn.Dense(self.num_params, name="prediction")(x).astype(jnp.float32)


@ROI_MASK_HEAD_REGISTRY.register()
class CoarseMaskHead(nn.Module):
    """[1x1 conv (channel reduce, optional)] + 2x2/2 conv + FCs + linear to
    output_side^2 * num_classes. Parameter names mirror the reference's
    ConvFCHead (reduce_channel_dim_conv / reduce_spatial_dim_conv / fcK /
    prediction) so zoo weights map through the converter."""

    num_classes: int
    conv_dim: int = 256
    fc_dims: Tuple[int, ...] = (1024, 1024)
    output_side_resolution: int = 7

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        return cls(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
            fc_dims=tuple([cfg.MODEL.ROI_MASK_HEAD.FC_DIM] * cfg.MODEL.ROI_MASK_HEAD.NUM_FC),
            output_side_resolution=cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] pooled features -> [R, side, side, num_classes]."""
        R = x.shape[0]
        side = self.output_side_resolution
        if x.shape[-1] > self.conv_dim:
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=1,
                activation=nn.relu,
                name="reduce_channel_dim_conv",
            )(x, train=train)
        x = Conv2d(
            features=self.conv_dim,
            kernel_size=2,
            strides=2,
            padding=0,
            activation=nn.relu,
            name="reduce_spatial_dim_conv",
        )(x, train=train)
        # flatten in torch's CHW order — the reference fc1 weight is laid out
        # for a [C, h, w] flatten
        x = x.transpose(0, 3, 1, 2).reshape(R, -1)
        for i, dim in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(dim, name=f"fc{i + 1}")(x))
        x = nn.Dense(side * side * self.num_classes, name="prediction")(x)
        # reference output is [R, C, side, side]; ours is NHWC
        return x.reshape(R, self.num_classes, side, side).transpose(0, 2, 3, 1).astype(jnp.float32)
