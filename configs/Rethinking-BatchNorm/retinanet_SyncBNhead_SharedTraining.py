"""RetinaNet SyncBN-head variant whose BN normalizes ALL FPN levels jointly
at train time (analogue of reference
projects/Rethinking-BatchNorm/configs/retinanet_SyncBNhead_SharedTraining.py).

The plain SyncBN head normalizes each level with that level's statistics —
inconsistent for a head shared across levels. This variant flattens every
level's activations into one batch for each BN, exactly the reference's
apply_sequential trick."""

import math
from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.layers.batch_norm import SyncBatchNorm
from detectron2_tpu.modeling.meta_arch.retinanet import RetinaNet


class RetinaNetHeadSharedTrainingBN(nn.Module):
    """4-conv cls/box subnets where each BN sees the concatenation of every
    level's activations (reference RetinaNetHead_SharedTrainingBN)."""

    num_classes: int
    num_anchors: int
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    prior_prob: float = 0.01

    def _subnet(self, feats: List[jnp.ndarray], prefix: str, train: bool):
        for i, d in enumerate(self.conv_dims):
            conv = nn.Conv(
                features=d,
                kernel_size=(3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=nn.initializers.normal(0.01),
                name=f"{prefix}_subnet{i}",
            )
            feats = [conv(f) for f in feats]
            # joint BN: one batch made of every level's pixels
            shapes = [f.shape for f in feats]
            flat = jnp.concatenate([f.reshape(-1, 1, 1, f.shape[-1]) for f in feats], axis=0)
            flat = SyncBatchNorm(features=self.conv_dims[i], name=f"{prefix}_bn{i}")(
                flat, train=train
            )
            sizes = [s[0] * s[1] * s[2] for s in shapes]
            offs = [0]
            for sz in sizes:
                offs.append(offs[-1] + sz)
            feats = [
                flat[offs[k] : offs[k + 1]].reshape(shapes[k]) for k in range(len(feats))
            ]
            feats = [nn.relu(f) for f in feats]
        return feats

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        cls_feats = self._subnet(features, "cls", train)
        box_feats = self._subnet(features, "bbox", train)
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(
            features=self.num_anchors * self.num_classes,
            kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            name="cls_score",
        )
        bbox_pred = nn.Conv(
            features=self.num_anchors * 4,
            kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )
        return [cls_score(f) for f in cls_feats], [bbox_pred(f) for f in box_feats]


def build_model():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.SOLVER.MAX_ITER = 270000
    cfg.SOLVER.STEPS = (210000, 250000)
    base = RetinaNet.from_config(cfg)
    return base.clone(
        head=RetinaNetHeadSharedTrainingBN(
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            num_anchors=base.anchor_generator.num_anchors[0],
        )
    )


model = L(build_model)()
