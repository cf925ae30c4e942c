"""Point head (reference projects/PointRend/point_rend/point_head.py):
a per-point MLP over fine-grained + coarse features."""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.utils.registry import Registry

POINT_HEAD_REGISTRY = Registry("POINT_HEAD")

__all__ = ["POINT_HEAD_REGISTRY", "StandardPointHead", "build_point_head", "roi_mask_point_loss"]


@POINT_HEAD_REGISTRY.register()
class StandardPointHead(nn.Module):
    """FC layers applied pointwise; the coarse prediction is re-concatenated
    to every layer's input when coarse_pred_each_layer is set."""

    num_classes: int
    fc_dims: Tuple[int, ...] = (256, 256, 256)
    coarse_pred_each_layer: bool = True
    cls_agnostic: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        return cls(
            num_classes=cfg.MODEL.POINT_HEAD.NUM_CLASSES,
            fc_dims=tuple([cfg.MODEL.POINT_HEAD.FC_DIM] * cfg.MODEL.POINT_HEAD.NUM_FC),
            coarse_pred_each_layer=cfg.MODEL.POINT_HEAD.COARSE_PRED_EACH_LAYER,
            cls_agnostic=cfg.MODEL.POINT_HEAD.CLS_AGNOSTIC_MASK,
        )

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray, train: bool = False):
        """fine: [R, P, Cf]; coarse: [R, P, Cc] -> point logits [R, P, C]."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i, dim in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(dim, name=f"fc{i + 1}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        num_out = 1 if self.cls_agnostic else self.num_classes
        return nn.Dense(num_out, name="predictor")(x).astype(jnp.float32)


def roi_mask_point_loss(
    point_logits: jnp.ndarray,  # [R, P, C or 1]
    gt_classes: jnp.ndarray,  # [R]
    gt_point_labels: jnp.ndarray,  # [R, P] in {0, 1}
    valid: jnp.ndarray,  # [R] bool
) -> jnp.ndarray:
    """BCE at sampled points, averaged over valid rois' points
    (reference point_head.py roi_mask_point_loss)."""
    from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits

    C = point_logits.shape[-1]
    if C == 1:
        sel = point_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, C - 1).astype(jnp.int32)
        sel = jnp.take_along_axis(point_logits, cls[:, None, None], axis=-1)[..., 0]
    bce = binary_cross_entropy_with_logits(sel, gt_point_labels.astype(jnp.float32))
    w = valid.astype(jnp.float32)[:, None]
    P = point_logits.shape[1]
    return (bce * w).sum() / jnp.maximum(w.sum() * P, 1.0)


def build_point_head(cfg, input_shape=None):
    return POINT_HEAD_REGISTRY.get(cfg.MODEL.POINT_HEAD.NAME).from_config(cfg, input_shape)
