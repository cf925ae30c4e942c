"""Feature Pyramid Network (reference detectron2/modeling/backbone/fpn.py:17-260).

NHWC flax module: lateral 1x1 convs + top-down nearest-2x upsampling + output
3x3 convs, with the optional extra levels (LastLevelMaxPool for p6,
LastLevelP6P7 for RetinaNet). size_divisibility = stride of the coarsest
level (reference fpn.py:113).
"""

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from detectron2_tpu.modeling.backbone.resnet import build_resnet_backbone

__all__ = ["FPN", "LastLevelMaxPool", "LastLevelP6P7", "build_resnet_fpn_backbone", "build_retinanet_resnet_fpn_backbone"]


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling in NHWC (cheap repeat; XLA fuses)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class LastLevelMaxPool(nn.Module):
    """Generates the extra p6 from p5 via stride-2 maxpool (reference fpn.py:188)."""

    num_levels: int = 1
    in_feature: str = "p5"

    @nn.compact
    def __call__(self, x, train: bool = False):
        return [nn.max_pool(x, (1, 1), strides=(2, 2))]


class LastLevelP6P7(nn.Module):
    """Generates p6, p7 from C5 (or p5) via two stride-2 3x3 convs
    (RetinaNet; reference fpn.py:203)."""

    out_channels: int
    in_feature: str = "res5"
    num_levels: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        p6 = Conv2d(features=self.out_channels, kernel_size=3, strides=2, padding=1, name="p6")(x, train=train)
        p7 = Conv2d(features=self.out_channels, kernel_size=3, strides=2, padding=1, name="p7")(
            nn.relu(p6), train=train
        )
        return [p6, p7]


class FPN(Backbone):
    """The FPN as a Backbone wrapping a bottom-up Backbone."""

    bottom_up: Backbone
    in_features: Tuple[str, ...]
    out_channels: int = 256
    norm: str = ""
    top_block: Optional[nn.Module] = None
    fuse_type: str = "sum"

    def _stage_info(self):
        shapes = self.bottom_up.output_shape()
        strides = [shapes[f].stride for f in self.in_features]
        # strides must be log2-contiguous
        for i, s in enumerate(strides):
            k = int(math.log2(s))
            assert s == 2**k, f"stride {s} is not a power of 2"
        return shapes, strides

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert self.fuse_type in {"sum", "avg"}
        bottom_up_features = self.bottom_up(x, train=train)
        _, strides = self._stage_info()

        results = []
        prev = None
        # top-down: start from the coarsest in_feature
        for idx, f in enumerate(reversed(self.in_features)):
            level = int(math.log2(strides[len(self.in_features) - 1 - idx]))
            feat = bottom_up_features[f]
            lateral = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=self.norm == "",
                norm=get_norm(self.norm, self.out_channels),
                name=f"fpn_lateral{level}",
            )(feat, train=train)
            if prev is not None:
                td = _upsample2x_nearest(prev)
                lateral = lateral + td
                if self.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            out = Conv2d(
                features=self.out_channels,
                kernel_size=3,
                padding=1,
                use_bias=self.norm == "",
                norm=get_norm(self.norm, self.out_channels),
                name=f"fpn_output{level}",
            )(lateral, train=train)
            results.insert(0, out)

        names = self._out_feature_names()
        if self.top_block is not None:
            if self.top_block.in_feature in bottom_up_features:
                top_block_in = bottom_up_features[self.top_block.in_feature]
            else:
                top_block_in = results[
                    self._out_feature_names(include_top=False).index(self.top_block.in_feature)
                ]
            results.extend(self.top_block(top_block_in, train=train))
        assert len(names) == len(results)
        return dict(zip(names, results))

    def _out_feature_names(self, include_top: bool = True):
        _, strides = self._stage_info()
        names = [f"p{int(math.log2(s))}" for s in strides]
        if include_top and self.top_block is not None:
            last = int(math.log2(strides[-1]))
            names += [f"p{last + i + 1}" for i in range(self.top_block.num_levels)]
        return names

    def output_shape(self) -> Dict[str, ShapeSpec]:
        _, strides = self._stage_info()
        all_strides = list(strides)
        if self.top_block is not None:
            for i in range(self.top_block.num_levels):
                all_strides.append(all_strides[-1] * 2)
        return {
            f"p{int(math.log2(s))}": ShapeSpec(channels=self.out_channels, stride=s)
            for s in all_strides
        }

    @property
    def size_divisibility(self) -> int:
        # stride of the coarsest in_feature (reference fpn.py:113); the extra
        # top-block levels are derived by strided ops and need no extra padding
        _, strides = self._stage_info()
        return strides[-1]


@BACKBONE_REGISTRY.register()
def build_resnet_fpn_backbone(cfg, input_shape: ShapeSpec = None) -> FPN:
    """ResNet + FPN with p6 maxpool (Faster/Mask R-CNN FPN models;
    reference fpn.py:225)."""
    bottom_up = build_resnet_backbone(cfg, input_shape)
    in_features = cfg.MODEL.FPN.IN_FEATURES
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(in_features),
        out_channels=out_channels,
        norm=cfg.MODEL.FPN.NORM,
        top_block=LastLevelMaxPool(),
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
    )


@BACKBONE_REGISTRY.register()
def build_retinanet_resnet_fpn_backbone(cfg, input_shape: ShapeSpec = None) -> FPN:
    """ResNet + FPN with P6/P7 from res5 (RetinaNet; reference fpn.py:248)."""
    bottom_up = build_resnet_backbone(cfg, input_shape)
    in_features = cfg.MODEL.FPN.IN_FEATURES
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    in_channels_p6p7 = bottom_up.output_shape()["res5"].channels
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(in_features),
        out_channels=out_channels,
        norm=cfg.MODEL.FPN.NORM,
        top_block=LastLevelP6P7(out_channels=out_channels, in_feature="res5"),
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
    )
