"""Mask R-CNN mask head (reference detectron2/modeling/roi_heads/mask_head.py).

Fixed-shape design: the head always runs on exactly ``Rf`` foreground slots
per image (the positive-capped sample budget), with a validity mask; the loss
(reference mask_rcnn_loss :33-113) is a mask-reduced mean BCE. GT targets are
produced device-side by resampling fixed-size per-instance mask crops (see
ROIHeads._forward_mask) instead of the reference's host polygon rasterization
per proposal.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits
from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.utils.registry import Registry

ROI_MASK_HEAD_REGISTRY = Registry("ROI_MASK_HEAD")
"""Registry for mask heads: region features -> per-class mask logits."""

__all__ = ["ROI_MASK_HEAD_REGISTRY", "MaskRCNNConvUpsampleHead", "build_mask_head", "mask_rcnn_loss", "mask_rcnn_inference"]


@ROI_MASK_HEAD_REGISTRY.register()
class MaskRCNNConvUpsampleHead(nn.Module):
    """N 3x3 convs + one 2x deconv + 1x1 predictor (reference mask_head.py:215)."""

    num_classes: int
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    conv_norm: str = ""
    cls_agnostic: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> mask logits [R, 2h, 2w, num_classes(or 1)].

        Reference convention (mask_head.py:226-250): conv_dims[:-1] are the
        3x3 convs, conv_dims[-1] is the deconv's output dim — so a
        NUM_CONV=0 C4 head still deconvs to CONV_DIM channels.
        """
        for i, dim in enumerate(self.conv_dims[:-1]):
            x = Conv2d(
                features=dim,
                kernel_size=3,
                padding=1,
                use_bias=not self.conv_norm,
                norm=get_norm(self.conv_norm, dim),
                activation=nn.relu,
                name=f"mask_fcn{i + 1}",
            )(x, train=train)
        x = ConvTranspose2d(
            features=self.conv_dims[-1] if self.conv_dims else x.shape[-1],
            kernel_size=2,
            strides=2,
            activation=nn.relu,
            name="deconv",
        )(x, train=train)
        num_out = 1 if self.cls_agnostic else self.num_classes
        x = Conv2d(
            features=num_out,
            kernel_size=1,
            name="predictor",
        )(x, train=train)
        return x.astype(jnp.float32)


def mask_rcnn_loss(
    pred_mask_logits: jnp.ndarray,  # [R, M, M, C or 1]
    gt_classes: jnp.ndarray,  # [R]
    gt_mask_targets: jnp.ndarray,  # [R, M, M] in {0, 1}
    fg_valid: jnp.ndarray,  # [R] bool
) -> jnp.ndarray:
    """Mean BCE over all pixels of valid foreground rois
    (reference mask_head.py:33-113)."""
    R, M, _, C = pred_mask_logits.shape
    if C == 1:
        logits = pred_mask_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, C - 1).astype(jnp.int32)
        logits = jnp.take_along_axis(
            pred_mask_logits, cls[:, None, None, None], axis=-1
        )[..., 0]
    bce = binary_cross_entropy_with_logits(logits, gt_mask_targets.astype(jnp.float32))
    w = fg_valid.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(w.sum() * M * M, 1.0)
    return (bce * w).sum() / denom


def mask_rcnn_inference(
    pred_mask_logits: jnp.ndarray,  # [R, M, M, C or 1]
    pred_classes: jnp.ndarray,  # [R]
) -> jnp.ndarray:
    """Select each detection's class channel and sigmoid
    (reference mask_head.py:115-150). Returns [R, M, M] probabilities."""
    C = pred_mask_logits.shape[-1]
    if C == 1:
        sel = pred_mask_logits[..., 0]
    else:
        cls = jnp.clip(pred_classes, 0, C - 1).astype(jnp.int32)
        sel = jnp.take_along_axis(pred_mask_logits, cls[:, None, None, None], axis=-1)[..., 0]
    return jax.nn.sigmoid(sel)


def build_mask_head(cfg, input_shape=None):
    name = cfg.MODEL.ROI_MASK_HEAD.NAME
    if name == "MaskRCNNConvUpsampleHead":
        num_conv = cfg.MODEL.ROI_MASK_HEAD.NUM_CONV
        return MaskRCNNConvUpsampleHead(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            # +1: the last entry is the deconv dim (reference mask_head.py:262)
            conv_dims=tuple([cfg.MODEL.ROI_MASK_HEAD.CONV_DIM] * (num_conv + 1)),
            conv_norm=cfg.MODEL.ROI_MASK_HEAD.NORM,
            cls_agnostic=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
        )
    head_cls = ROI_MASK_HEAD_REGISTRY.get(name)
    if hasattr(head_cls, "from_config"):
        return head_cls.from_config(cfg, input_shape)
    return head_cls(cfg, input_shape)
