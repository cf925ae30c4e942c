"""Panoptic-DeepLab meta-architecture and heads
(reference projects/Panoptic-DeepLab/panoptic_deeplab/panoptic_seg.py).

Batch contract (train): image/image_sizes plus
``gt_sem_seg`` [B, H, W], ``gt_center`` [B, H, W] (gaussian heatmap),
``gt_offset`` [B, H, W, 2], ``gt_center_weights``/``gt_offset_weights``
[B, H, W] — produced host-side by :class:`PanopticDeepLabTargetGenerator`.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone import Backbone, build_backbone
from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from detectron2_tpu.modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY
from detectron2_tpu.projects.deeplab.loss import hard_pixel_mining_ce
from detectron2_tpu.projects.deeplab.semantic_seg import DeepLabV3PlusHead, _resize
from detectron2_tpu.utils.registry import Registry

INS_EMBED_BRANCHES_REGISTRY = Registry("INS_EMBED_BRANCHES")

__all__ = ["PanopticDeepLab", "PanopticDeepLabSemSegHead", "PanopticDeepLabInsEmbedHead"]


@SEM_SEG_HEADS_REGISTRY.register()
class PanopticDeepLabSemSegHead(DeepLabV3PlusHead):
    """DeepLabV3+ decoder + an extra head conv before the predictor; the loss
    weights pixels by the (center-emphasising) weight map when provided."""

    head_channels: int = 256

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        base = DeepLabV3PlusHead.from_config.__func__(cls, cfg, input_shape)
        return base.clone(head_channels=cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS)

    def _head_tower(self, y, name, train):
        """The reference's extra transform before each predictor
        (panoptic_seg.py:270-306): TWO stacked 3x3 convs (decoder_dim ->
        decoder_dim -> head_channels), or a single 5x5 depthwise-separable
        conv with the same receptive field when USE_DEPTHWISE_SEPARABLE_CONV."""
        from detectron2_tpu.layers.blocks import DepthwiseSeparableConv2d

        if self.use_depthwise_separable_conv:
            return DepthwiseSeparableConv2d(
                in_channels=y.shape[-1],
                out_channels=self.head_channels,
                kernel_size=5,
                padding=2,
                norm1=self.norm,
                activation1=nn.relu,
                norm2=self.norm,
                activation2=nn.relu,
                name=name,
            )(y, train=train)
        for k, ch in enumerate((y.shape[-1], self.head_channels)):
            y = Conv2d(
                features=ch,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=get_norm(self.norm, ch),
                activation=nn.relu,
                name=f"{name}{k}",
            )(y, train=train)
        return y

    @nn.compact
    def __call__(self, features, targets=None, weights=None, train: bool = False):
        y = self._decoder(features, train=train)
        y = self._head_tower(y, "head", train)
        logits = Conv2d(features=self.num_classes, kernel_size=1, name="predictor")(y, train=train)
        out_stride = self.feature_strides[0]
        logits = _resize(
            logits.astype(jnp.float32), logits.shape[1] * out_stride, logits.shape[2] * out_stride
        )
        if train:
            assert targets is not None
            up = _resize(logits, targets.shape[1], targets.shape[2])
            loss = hard_pixel_mining_ce(
                up, targets, ignore_index=self.ignore_value, top_k_percent=self.loss_top_k
            )
            return None, {"loss_sem_seg": loss * self.loss_weight}
        return logits, {}

    def _decoder(self, features, train):
        """The shared V3+ decoder body (ASPP + low-level fusion), factored out
        so the ins-embed head can reuse the identical structure."""
        from detectron2_tpu.layers.aspp import ASPP

        x = features[self.in_features[-1]]
        y = ASPP(
            in_channels=x.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dropout=self.aspp_dropout,
            use_depthwise_separable_conv=self.use_depthwise_separable_conv,
            name="aspp",
        )(x, train=train)
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
        return y


@INS_EMBED_BRANCHES_REGISTRY.register()
class PanopticDeepLabInsEmbedHead(DeepLabV3PlusHead):
    """Instance branch: shared V3+ decoder, then center (1ch sigmoid-free
    heatmap, MSE loss) and offset (2ch, L1 loss) sub-heads."""

    head_channels: int = 32
    center_loss_weight: float = 200.0
    offset_loss_weight: float = 0.01

    @classmethod
    def from_config(cls, cfg, input_shape: Dict[str, ShapeSpec]):
        h = cfg.MODEL.INS_EMBED_HEAD
        in_features = tuple(h.IN_FEATURES)
        return cls(
            in_features=in_features,
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            project_channels=tuple(h.PROJECT_CHANNELS),
            aspp_channels=h.ASPP_CHANNELS,
            aspp_dilations=tuple(h.ASPP_DILATIONS),
            aspp_dropout=h.ASPP_DROPOUT,
            num_classes=1,  # unused
            conv_dims=h.CONVS_DIM,
            common_stride=h.COMMON_STRIDE,
            norm=h.NORM,
            head_channels=h.HEAD_CHANNELS,
            center_loss_weight=h.CENTER_LOSS_WEIGHT,
            offset_loss_weight=h.OFFSET_LOSS_WEIGHT,
            # reference passes the SEM_SEG_HEAD flag to the ins head too
            use_depthwise_separable_conv=cfg.MODEL.SEM_SEG_HEAD.USE_DEPTHWISE_SEPARABLE_CONV,
        )

    @nn.compact
    def __call__(
        self,
        features,
        center_targets=None,
        offset_targets=None,
        center_weights=None,
        offset_weights=None,
        train: bool = False,
    ):
        y = PanopticDeepLabSemSegHead._decoder(self, features, train)
        stride = self.feature_strides[0]

        # reference panoptic_seg.py:403-471: center_head is ALWAYS two
        # stacked 3x3 convs; offset_head switches to the 5x5 DSConv variant
        center_h = y
        for k, ch in enumerate((y.shape[-1], self.head_channels)):
            center_h = Conv2d(
                features=ch,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=get_norm(self.norm, ch),
                activation=nn.relu,
                name=f"center_head{k}",
            )(center_h, train=train)
        offset_h = PanopticDeepLabSemSegHead._head_tower(self, y, "offset_head", train)

        center = Conv2d(features=1, kernel_size=1, name="center_predictor")(
            center_h, train=train
        ).astype(jnp.float32)
        offset = Conv2d(features=2, kernel_size=1, name="offset_predictor")(
            offset_h, train=train
        ).astype(jnp.float32)
        center = _resize(center, center.shape[1] * stride, center.shape[2] * stride)[..., 0]
        offset = _resize(offset, offset.shape[1] * stride, offset.shape[2] * stride) * stride

        if train:
            assert center_targets is not None and offset_targets is not None
            cw = center_weights if center_weights is not None else jnp.ones_like(center)
            ow = offset_weights if offset_weights is not None else jnp.ones_like(center)
            loss_center = ((center - center_targets) ** 2 * cw).sum() / jnp.maximum(cw.sum(), 1.0)
            l1 = jnp.abs(offset - offset_targets).sum(-1)
            loss_offset = (l1 * ow).sum() / jnp.maximum(ow.sum(), 1.0)
            return (
                None,
                None,
                {
                    "loss_center": loss_center * self.center_loss_weight,
                    "loss_offset": loss_offset * self.offset_loss_weight,
                },
            )
        return center, offset, {}


@META_ARCH_REGISTRY.register()
class PanopticDeepLab(nn.Module):
    """backbone + semantic head + instance-embedding head
    (reference panoptic_seg.py:PanopticDeepLab)."""

    backbone: Backbone
    sem_seg_head: nn.Module
    ins_embed_head: nn.Module
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    compute_dtype: str = "bfloat16"
    stuff_area: int = 2048
    center_threshold: float = 0.1
    nms_kernel: int = 7
    top_k_instances: int = 200

    @classmethod
    def from_config(cls, cfg):
        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        return cls(
            backbone=backbone,
            sem_seg_head=SEM_SEG_HEADS_REGISTRY.get(cfg.MODEL.SEM_SEG_HEAD.NAME).from_config(
                cfg, shapes
            ),
            ins_embed_head=INS_EMBED_BRANCHES_REGISTRY.get(
                cfg.MODEL.INS_EMBED_HEAD.NAME
            ).from_config(cfg, shapes),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            stuff_area=cfg.MODEL.PANOPTIC_DEEPLAB.STUFF_AREA,
            center_threshold=cfg.MODEL.PANOPTIC_DEEPLAB.CENTER_THRESHOLD,
            nms_kernel=cfg.MODEL.PANOPTIC_DEEPLAB.NMS_KERNEL,
            top_k_instances=cfg.MODEL.PANOPTIC_DEEPLAB.TOP_K_INSTANCE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = ((batch["image"].astype(jnp.float32) - mean) / std).astype(
            jnp.dtype(self.compute_dtype)
        )
        features = self.backbone(images, train=train)

        if train:
            _, sem_losses = self.sem_seg_head(
                features, targets=batch["gt_sem_seg"], train=True
            )
            _, _, ins_losses = self.ins_embed_head(
                features,
                center_targets=batch["gt_center"],
                offset_targets=batch["gt_offset"],
                center_weights=batch.get("gt_center_weights"),
                offset_weights=batch.get("gt_offset_weights"),
                train=True,
            )
            return {**sem_losses, **ins_losses}

        sem_logits, _ = self.sem_seg_head(features, train=False)
        center, offset, _ = self.ins_embed_head(features, train=False)
        return {"sem_seg": sem_logits, "center": center, "offset": offset}
