"""DeepLabV3 / DeepLabV3+ heads
(reference projects/DeepLab/deeplab/semantic_seg.py).

Both heads follow the framework sem-seg head contract
(:class:`~detectron2_tpu.modeling.meta_arch.semantic_seg.SemSegFPNHead`):
``__call__(features, targets=None, train=False) -> (logits_or_None, losses)``
with logits returned at input resolution for inference.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.aspp import ASPP
from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.blocks import DepthwiseSeparableConv2d
from detectron2_tpu.layers.losses import cross_entropy
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY
from detectron2_tpu.projects.deeplab.loss import hard_pixel_mining_ce

__all__ = ["DeepLabV3Head", "DeepLabV3PlusHead"]


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def _sem_seg_loss(logits, targets, loss_type, top_k, ignore_value, loss_weight):
    b, h, w, _ = logits.shape
    up = _resize(logits.astype(jnp.float32), targets.shape[1], targets.shape[2])
    if loss_type == "cross_entropy":
        loss = cross_entropy(up, targets, reduction="mean", ignore_index=ignore_value)
    elif loss_type == "hard_pixel_mining":
        loss = hard_pixel_mining_ce(up, targets, ignore_index=ignore_value, top_k_percent=top_k)
    else:
        raise ValueError(f"Unexpected loss type: {loss_type}")
    return {"loss_sem_seg": loss * loss_weight}


@SEM_SEG_HEADS_REGISTRY.register()
class DeepLabV3Head(nn.Module):
    """ASPP on the deepest feature + 1x1 predictor."""

    in_features: Tuple[str, ...]
    feature_strides: Tuple[int, ...]
    aspp_channels: int = 256
    aspp_dilations: Tuple[int, ...] = (6, 12, 18)
    aspp_dropout: float = 0.1
    num_classes: int = 19
    conv_dims: int = 256
    common_stride: int = 4
    norm: str = "GN"
    loss_weight: float = 1.0
    loss_type: str = "cross_entropy"
    loss_top_k: float = 0.2
    ignore_value: int = 255

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        return cls(
            in_features=in_features,
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            aspp_channels=cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS,
            aspp_dilations=tuple(cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS),
            aspp_dropout=cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT,
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            conv_dims=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            loss_type=cfg.MODEL.SEM_SEG_HEAD.LOSS_TYPE,
            loss_top_k=cfg.MODEL.SEM_SEG_HEAD.LOSS_TOP_K,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        )

    @nn.compact
    def __call__(self, features, targets: Optional[jnp.ndarray] = None, train: bool = False):
        assert len(self.in_features) == 1, "DeepLabV3Head takes one (dilated) feature"
        x = features[self.in_features[0]]
        x = ASPP(
            in_channels=x.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dropout=self.aspp_dropout,
            name="aspp",
        )(x, train=train)
        logits = Conv2d(features=self.num_classes, kernel_size=1, name="predictor")(x, train=train)
        stride = self.feature_strides[0]
        logits = _resize(logits.astype(jnp.float32), logits.shape[1] * stride, logits.shape[2] * stride)
        if train:
            assert targets is not None
            return None, _sem_seg_loss(
                logits, targets, self.loss_type, self.loss_top_k, self.ignore_value, self.loss_weight
            )
        return logits, {}


@SEM_SEG_HEADS_REGISTRY.register()
class DeepLabV3PlusHead(nn.Module):
    """ASPP on the deepest feature + low-level decoder fusion (V3+)."""

    in_features: Tuple[str, ...]  # low→high resolution order, last = ASPP input
    feature_strides: Tuple[int, ...]
    project_channels: Tuple[int, ...]
    aspp_channels: int = 256
    aspp_dilations: Tuple[int, ...] = (6, 12, 18)
    aspp_dropout: float = 0.1
    num_classes: int = 19
    conv_dims: int = 256
    common_stride: int = 4
    norm: str = "GN"
    loss_weight: float = 1.0
    loss_type: str = "cross_entropy"
    loss_top_k: float = 0.2
    ignore_value: int = 255
    use_depthwise_separable_conv: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        project_features = tuple(cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES)
        assert in_features[:-1] == project_features, (
            "PROJECT_FEATURES must be IN_FEATURES minus the last (ASPP) feature"
        )
        return cls(
            in_features=in_features,
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            project_channels=tuple(cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS),
            aspp_channels=cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS,
            aspp_dilations=tuple(cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS),
            aspp_dropout=cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT,
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            conv_dims=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            loss_type=cfg.MODEL.SEM_SEG_HEAD.LOSS_TYPE,
            loss_top_k=cfg.MODEL.SEM_SEG_HEAD.LOSS_TOP_K,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            use_depthwise_separable_conv=cfg.MODEL.SEM_SEG_HEAD.USE_DEPTHWISE_SEPARABLE_CONV,
        )

    def _fuse_conv(self, x, out_channels, name, train):
        """Decoder fuse (reference deeplab/semantic_seg.py:128-165): either a
        single 5x5 depthwise-separable conv (the Panoptic-DeepLab variant —
        same receptive field as two 3x3s) or TWO stacked 3x3 convs."""
        if self.use_depthwise_separable_conv:
            return DepthwiseSeparableConv2d(
                in_channels=x.shape[-1],
                out_channels=out_channels,
                kernel_size=5,
                padding=2,
                norm1=self.norm,
                activation1=nn.relu,
                norm2=self.norm,
                activation2=nn.relu,
                name=name,
            )(x, train=train)
        for k in range(2):
            x = Conv2d(
                features=out_channels,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=get_norm(self.norm, out_channels),
                activation=nn.relu,
                name=f"{name}{k}",
            )(x, train=train)
        return x

    @nn.compact
    def __call__(self, features, targets: Optional[jnp.ndarray] = None, train: bool = False):
        # deepest feature through ASPP
        x = features[self.in_features[-1]]
        y = ASPP(
            in_channels=x.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dropout=self.aspp_dropout,
            # dsconv variant swaps the atrous branches too (reference
            # deeplab/semantic_seg.py:141 passes it into the decoder ASPP)
            use_depthwise_separable_conv=self.use_depthwise_separable_conv,
            name="aspp",
        )(x, train=train)

        # decoder: fuse progressively higher-resolution projected features
        for f, ch in zip(reversed(self.in_features[:-1]), reversed(self.project_channels)):
            low = Conv2d(
                features=ch,
                kernel_size=1,
                use_bias=not self.norm,
                norm=get_norm(self.norm, ch),
                activation=nn.relu,
                name=f"{f}_project",
            )(features[f], train=train)
            y = _resize(y, low.shape[1], low.shape[2])
            y = jnp.concatenate([y, low], axis=-1)
            y = self._fuse_conv(y, self.conv_dims, f"{f}_fuse", train)

        logits = Conv2d(features=self.num_classes, kernel_size=1, name="predictor")(y, train=train)
        out_stride = self.feature_strides[0]
        logits = _resize(
            logits.astype(jnp.float32), logits.shape[1] * out_stride, logits.shape[2] * out_stride
        )
        if train:
            assert targets is not None
            return None, _sem_seg_loss(
                logits, targets, self.loss_type, self.loss_top_k, self.ignore_value, self.loss_weight
            )
        return logits, {}
