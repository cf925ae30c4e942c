"""Box feature extraction head (reference detectron2/modeling/roi_heads/box_head.py)."""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.utils.registry import Registry

ROI_BOX_HEAD_REGISTRY = Registry("ROI_BOX_HEAD")
"""Registry for box heads: pooled region features -> flat box features."""

__all__ = ["ROI_BOX_HEAD_REGISTRY", "FastRCNNConvFCHead", "build_box_head"]


@ROI_BOX_HEAD_REGISTRY.register()
class FastRCNNConvFCHead(nn.Module):
    """N conv layers + M fc layers (reference box_head.py:26-111; the default
    FPN config is 0 conv + 2 fc of 1024)."""

    conv_dims: Tuple[int, ...] = ()
    fc_dims: Tuple[int, ...] = (1024, 1024)
    conv_norm: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] pooled features -> [R, output_dim]."""
        for i, dim in enumerate(self.conv_dims):
            x = Conv2d(
                features=dim,
                kernel_size=3,
                padding=1,
                use_bias=not self.conv_norm,
                norm=get_norm(self.conv_norm, dim),
                activation=nn.relu,
                name=f"conv{i + 1}",
            )(x, train=train)
        if len(self.fc_dims):
            # flatten in torch's CHW order: the d2 zoo fc1 weight is laid out
            # for [R, C*h*w] inputs — flattening HWC here would silently
            # permute fc1's input features when loading converted checkpoints
            x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
            for i, dim in enumerate(self.fc_dims):
                x = nn.Dense(
                    dim,
                    name=f"fc{i + 1}",
                    kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                )(x)
                x = nn.relu(x)
        return x

    @property
    def output_dim(self) -> int:
        if len(self.fc_dims):
            return self.fc_dims[-1]
        return self.conv_dims[-1]


def build_box_head(cfg, input_shape=None):
    """Build a box head from `cfg.MODEL.ROI_BOX_HEAD.NAME`."""
    name = cfg.MODEL.ROI_BOX_HEAD.NAME
    if name == "":
        name = "FastRCNNConvFCHead"
    if name == "FastRCNNConvFCHead":
        return FastRCNNConvFCHead(
            conv_dims=tuple([cfg.MODEL.ROI_BOX_HEAD.CONV_DIM] * cfg.MODEL.ROI_BOX_HEAD.NUM_CONV),
            fc_dims=tuple([cfg.MODEL.ROI_BOX_HEAD.FC_DIM] * cfg.MODEL.ROI_BOX_HEAD.NUM_FC),
            conv_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
        )
    return ROI_BOX_HEAD_REGISTRY.get(name)(cfg, input_shape)
