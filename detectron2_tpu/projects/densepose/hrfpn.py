"""HRFPN — High Resolution Feature Pyramids
(reference projects/DensePose/densepose/modeling/hrfpn.py:36-184).

Turns the HRNet branches into a 5-level ROI pyramid: each branch is
upsampled to (near) stride 4 by a learned padding-0 deconv (+BN+relu), the
branches are concatenated (cropped to the common minimum size), and each
output level is produced by one stride-2^i kernel-2^i reduction conv
(+BN+relu) followed by a per-level 3x3 fpn conv.
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import BatchNorm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d, ConvTranspose2d
from detectron2_tpu.modeling.backbone import BACKBONE_REGISTRY, Backbone
from detectron2_tpu.projects.densepose.hrnet import PoseHigherResolutionNet

__all__ = ["HRFPN", "build_hrfpn_backbone"]


class HRFPN(Backbone):
    """See module docstring. Flax names mirror the torch ModuleList paths
    with "_" separators (``interp_conv_0_0`` = interp_conv.0.0 etc.)."""

    bottom_up: PoseHigherResolutionNet
    in_channels: Tuple[int, ...] = (32, 64, 128, 256)
    n_out_features: int = 5
    out_channels: int = 256

    @classmethod
    def from_config(cls, cfg):
        return cls(
            bottom_up=PoseHigherResolutionNet.from_config(cfg),
            in_channels=tuple(int(c) for c in cfg.MODEL.HRNET.STAGE4.NUM_CHANNELS),
            n_out_features=len(cfg.MODEL.ROI_HEADS.IN_FEATURES),
            out_channels=int(cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS),
        )

    def output_shape(self):
        return {
            f"p{i + 1}": ShapeSpec(channels=self.out_channels, stride=2 ** (i + 2))
            for i in range(self.n_out_features)
        }

    @property
    def size_divisibility(self):
        return 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.bottom_up(x, train=train)
        inputs = [feats[f"p{i + 1}"] for i in range(len(self.in_channels))]

        # learned upsample of each branch: ConvTranspose(k=4, s=2^i, p=0)
        outs = []
        for i, z in enumerate(inputs):
            z = ConvTranspose2d(
                features=self.in_channels[i],
                kernel_size=4,
                strides=2**i,
                use_bias=False,
                # torch padding=0: out = (in-1)*s + 4 (bit-exact for all
                # strides incl. s > k, where flax "VALID" diverges)
                padding=((3, 3), (3, 3)),
                name=f"interp_conv_{i}_0",
            )(z, train=train)
            z = BatchNorm(self.in_channels[i], momentum=0.9, name=f"interp_conv_{i}_1")(
                z, train=train
            )
            outs.append(nn.relu(z))
        h = min(o.shape[1] for o in outs)
        w = min(o.shape[2] for o in outs)
        out = jnp.concatenate([o[:, :h, :w] for o in outs], axis=-1)

        # one conv replaces (reduction conv + pooling) per level
        levels = []
        for i in range(self.n_out_features):
            z = Conv2d(
                self.out_channels, 2**i, strides=2**i, use_bias=True,
                name=f"reduction_pooling_conv_{i}_0",
            )(out, train=train)
            z = BatchNorm(self.out_channels, momentum=0.9, name=f"reduction_pooling_conv_{i}_1")(
                z, train=train
            )
            levels.append(nn.relu(z))
        # make shapes consistent: crop each level to 2^i x the deepest level
        for i in range(len(levels)):
            th = levels[-1].shape[1] * 2**i
            tw = levels[-1].shape[2] * 2**i
            levels[-1 - i] = levels[-1 - i][:, :th, :tw]

        outputs = {}
        for i, z in enumerate(levels):
            outputs[f"p{i + 1}"] = Conv2d(
                self.out_channels, 3, padding=1, name=f"fpn_conv_{i}"
            )(z, train=train)
        return outputs


@BACKBONE_REGISTRY.register()
def build_hrfpn_backbone(cfg, input_shape=None):
    return HRFPN.from_config(cfg)
