"""Keypoint R-CNN head (reference detectron2/modeling/roi_heads/keypoint_head.py)."""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import cross_entropy
from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.structures.keypoints import _keypoints_to_heatmap
from detectron2_tpu.utils.registry import Registry

ROI_KEYPOINT_HEAD_REGISTRY = Registry("ROI_KEYPOINT_HEAD")
"""Registry for keypoint heads: region features -> keypoint heatmaps."""

__all__ = [
    "ROI_KEYPOINT_HEAD_REGISTRY",
    "KRCNNConvDeconvUpsampleHead",
    "build_keypoint_head",
    "keypoint_rcnn_loss",
    "keypoint_rcnn_inference",
]


@ROI_KEYPOINT_HEAD_REGISTRY.register()
class KRCNNConvDeconvUpsampleHead(nn.Module):
    """8x conv512 + deconv + 2x bilinear upsample -> K heatmaps
    (reference keypoint_head.py:218)."""

    num_keypoints: int = 17
    conv_dims: Tuple[int, ...] = tuple(512 for _ in range(8))

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, h, w, C] -> [R, 4h, 4w, K] keypoint logits."""
        for i, dim in enumerate(self.conv_dims):
            x = Conv2d(
                features=dim, kernel_size=3, padding=1, activation=nn.relu, name=f"conv_fcn{i + 1}"
            )(x, train=train)
        x = ConvTranspose2d(
            features=self.num_keypoints, kernel_size=4, strides=2, name="score_lowres"
        )(x, train=train)
        # fixed 2x bilinear upsampling (the reference's interpolate(x, 2))
        R, H, W, K = x.shape
        x = jax.image.resize(x, (R, H * 2, W * 2, K), method="bilinear")
        return x.astype(jnp.float32)


def keypoint_rcnn_loss(
    pred_keypoint_logits: jnp.ndarray,  # [R, S, S, K]
    proposal_boxes: jnp.ndarray,  # [R, 4]
    gt_keypoints: jnp.ndarray,  # [R, K, 3] matched gt keypoints
    fg_valid: jnp.ndarray,  # [R]
    normalizer: float = None,
) -> jnp.ndarray:
    """Softmax CE over the S*S heatmap per visible keypoint
    (reference keypoint_head.py:40-98)."""
    R, S, _, K = pred_keypoint_logits.shape
    heatmaps, valid = _keypoints_to_heatmap(gt_keypoints, proposal_boxes, S)  # [R, K]
    valid = valid & fg_valid[:, None]

    logits = pred_keypoint_logits.reshape(R, S * S, K).transpose(0, 2, 1).reshape(R * K, S * S)
    targets = heatmaps.reshape(R * K)
    v = valid.reshape(R * K)

    ce = cross_entropy(logits, jnp.where(v, targets, -100), reduction="sum", ignore_index=-100)
    if normalizer is None:
        normalizer = jnp.maximum(v.sum(), 1)
    return ce / normalizer


def keypoint_rcnn_inference(
    pred_keypoint_logits: jnp.ndarray,  # [R, S, S, K]
    pred_boxes: jnp.ndarray,  # [R, 4]
) -> jnp.ndarray:
    """Decode heatmaps to (x, y, logit, prob) keypoints in image coords
    (reference keypoint_head.py:99-140)."""
    from detectron2_tpu.structures.keypoints import heatmaps_to_keypoints

    # [R, S, S, K] -> [R, K, S, S]
    maps = jnp.transpose(pred_keypoint_logits, (0, 3, 1, 2))
    return heatmaps_to_keypoints(maps, pred_boxes)


def build_keypoint_head(cfg, input_shape=None):
    name = cfg.MODEL.ROI_KEYPOINT_HEAD.NAME
    if name == "KRCNNConvDeconvUpsampleHead":
        return KRCNNConvDeconvUpsampleHead(
            num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
            conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
        )
    return ROI_KEYPOINT_HEAD_REGISTRY.get(name)(cfg, input_shape)
