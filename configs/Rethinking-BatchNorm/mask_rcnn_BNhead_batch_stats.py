"""Mask R-CNN BN-head variant that normalizes with BATCH statistics at
inference (analogue of reference
projects/Rethinking-BatchNorm/configs/mask_rcnn_BNhead_batch_stats.py).

After training with mask_rcnn_BNhead.py, load that model with this config for
inference only — train-time behavior is identical, so no retraining."""

import jax
from flax import linen as nn


class BatchNormBatchStat(nn.Module):
    """BN that uses the current batch's statistics in inference too (the
    reference's BatchNormBatchStat). Param names match nn.BatchNorm so
    BN-head checkpoints load unchanged; the running buffers are ignored."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-5
        mean = x.mean(axis=tuple(range(x.ndim - 1)))
        var = x.var(axis=tuple(range(x.ndim - 1)))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)


from .mask_rcnn_BNhead import dataloader, lr_multiplier, model, optimizer, train  # noqa

model.roi_heads.box_head.conv_norm = BatchNormBatchStat
model.roi_heads.mask_head.conv_norm = BatchNormBatchStat
