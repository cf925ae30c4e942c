"""Semantic segmentation meta-arch + FPN semseg head
(reference detectron2/modeling/meta_arch/semantic_seg.py:26-250)."""

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.losses import cross_entropy
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.utils.registry import Registry

SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
"""Registry for semantic segmentation heads operating on backbone features."""

__all__ = ["SemanticSegmentor", "SEM_SEG_HEADS_REGISTRY", "SemSegFPNHead", "build_sem_seg_head"]


def build_sem_seg_head(cfg, input_shape):
    name = cfg.MODEL.SEM_SEG_HEAD.NAME
    return SEM_SEG_HEADS_REGISTRY.get(name).from_config(cfg, input_shape)


@META_ARCH_REGISTRY.register()
class SemanticSegmentor(nn.Module):
    """backbone + per-pixel head (reference semantic_seg.py:34-140)."""

    backbone: Backbone
    sem_seg_head: nn.Module
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    compute_dtype: str = "bfloat16"

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        return cls(
            backbone=backbone,
            sem_seg_head=build_sem_seg_head(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = ((batch["image"].astype(jnp.float32) - mean) / std).astype(
            jnp.dtype(self.compute_dtype)
        )
        features = self.backbone(images, train=train)
        logits, losses = self.sem_seg_head(
            features, targets=batch.get("gt_sem_seg"), train=train
        )
        if train:
            return losses
        # [B, H, W, C] logits in the (padded) network frame; host rescales
        return {"sem_seg": logits}


@SEM_SEG_HEADS_REGISTRY.register()
class SemSegFPNHead(nn.Module):
    """FPN semseg head: each level is upscaled to the common stride with
    conv+norm+relu(+2x bilinear), summed, and 1x1-predicted
    (reference semantic_seg.py:143-250)."""

    in_features: Tuple[str, ...]
    feature_strides: Tuple[int, ...]
    feature_channels: Tuple[int, ...]
    num_classes: int = 54
    conv_dims: int = 128
    common_stride: int = 4
    norm: str = "GN"
    loss_weight: float = 1.0
    ignore_value: int = 255

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        return cls(
            in_features=in_features,
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            feature_channels=tuple(input_shape[f].channels for f in in_features),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            conv_dims=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        )

    @nn.compact
    def layers(self, features: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        """The conv tower: per-level convs upscaled to the common stride,
        summed, 1x1-predicted. Returns f32 logits [B, H/cs, W/cs, C]
        (reference semantic_seg.py SemSegFPNHead.layers)."""
        import math

        outs = []
        for i, (f, stride) in enumerate(zip(self.in_features, self.feature_strides)):
            x = features[f]
            head_length = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            for k in range(head_length):
                x = Conv2d(
                    features=self.conv_dims,
                    kernel_size=3,
                    padding=1,
                    use_bias=not self.norm,
                    norm=get_norm(self.norm, self.conv_dims),
                    activation=nn.relu,
                    name=f"{f}_conv{k}",
                )(x, train=train)
                if stride != self.common_stride:
                    B, H, W, C = x.shape
                    x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
                    stride //= 2
            outs.append(x)
        x = sum(outs)
        logits = Conv2d(features=self.num_classes, kernel_size=1, name="predictor")(x, train=train)
        return logits.astype(jnp.float32)

    def losses(self, logits: jnp.ndarray, targets: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Per-pixel CE at target resolution (reference SemSegFPNHead.losses)."""
        B, H, W, C = logits.shape
        up = jax.image.resize(
            logits, (B, H * self.common_stride, W * self.common_stride, C), method="bilinear"
        )
        th, tw = targets.shape[1], targets.shape[2]
        up = up[:, :th, :tw]
        loss = cross_entropy(up, targets, reduction="mean", ignore_index=self.ignore_value)
        return {"loss_sem_seg": loss * self.loss_weight}

    def __call__(self, features: Dict[str, jnp.ndarray], targets: Optional[jnp.ndarray] = None, train: bool = False):
        logits = self.layers(features, train=train)
        if train:
            assert targets is not None
            return None, self.losses(logits, targets)
        B, H, W, C = logits.shape
        up = jax.image.resize(
            logits, (B, H * self.common_stride, W * self.common_stride, C), method="bilinear"
        )
        return up, {}
