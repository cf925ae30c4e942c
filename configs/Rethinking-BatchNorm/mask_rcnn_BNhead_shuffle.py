"""Mask R-CNN BN-head variant that SHUFFLES RoIs before the heads at train
time (analogue of reference
projects/Rethinking-BatchNorm/configs/mask_rcnn_BNhead_shuffle.py).

The reference gathers RoIs across GPUs, applies a broadcast random
permutation, runs the BN heads, and unshuffles — decorrelating each BN
batch from the per-image RoI grouping. Under single-controller SPMD the RoI
tensor is already one global array, so a global permutation inside the
compiled step is the exact equivalent; XLA inserts the cross-chip data
movement the permutation implies."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.roi_heads import FastRCNNConvFCHead, MaskRCNNConvUpsampleHead

from .mask_rcnn_BNhead import dataloader, lr_multiplier, model, optimizer, train  # noqa


class _Shuffled(nn.Module):
    """Run ``inner`` on a globally permuted RoI batch, restoring order after
    (train only; the permutation is a pure relabeling, so gradients and
    outputs are exact up to BN batch composition — which is the point)."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train:
            return self.inner(x, train=train)
        idx = jax.random.permutation(self.make_rng("sampling"), x.shape[0])
        out = self.inner(x[idx], train=train)
        return out[jnp.argsort(idx)]


class ShuffledBoxHead(_Shuffled):
    pass


class ShuffledMaskHead(_Shuffled):
    pass


model.roi_heads.box_head = L(ShuffledBoxHead)(
    inner=L(FastRCNNConvFCHead)(
        conv_dims=(256, 256, 256, 256), fc_dims=(1024,), conv_norm="BN"
    )
)
model.roi_heads.mask_head = L(ShuffledMaskHead)(
    inner=L(MaskRCNNConvUpsampleHead)(
        num_classes=80, conv_dims=(256, 256, 256, 256), conv_norm="BN"
    )
)

train["output_dir"] = "./output/mask_rcnn_BNhead_shuffle"
