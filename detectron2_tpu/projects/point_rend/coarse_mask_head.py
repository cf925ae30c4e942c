"""Coarse mask head (reference projects/PointRend/point_rend/coarse_mask_head.py):
conv + FCs predicting a low-resolution (7x7) per-class mask that the point
head subsequently refines."""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.roi_heads.mask_head import ROI_MASK_HEAD_REGISTRY

__all__ = ["CoarseMaskHead"]


@ROI_MASK_HEAD_REGISTRY.register()
class CoarseMaskHead(nn.Module):
    """conv 1x1 (dim reduce) + 2 FCs + linear to output_side^2 * num_classes."""

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
        x = Conv2d(features=self.conv_dim, kernel_size=2, strides=2, activation=nn.relu, name="reduce_spatial_dim_conv")(
            x, train=train
        )
        x = x.reshape(R, -1)
        for i, dim in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(dim, name=f"coarse_mask_fc{i + 1}")(x))
        x = nn.Dense(side * side * self.num_classes, name="prediction")(x)
        return x.reshape(R, side, side, self.num_classes).astype(jnp.float32)
