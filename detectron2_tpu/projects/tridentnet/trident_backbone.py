"""Trident ResNet backbone
(reference projects/TridentNet/tridentnet/trident_backbone.py).

``TridentResNet`` runs the stem/res2/res3 once, then fans res4 out into
``num_branch`` weight-shared branches with per-branch dilation (the
``TridentConv`` in every bottleneck's 3x3 slot) and exposes each branch as a
feature map ``res4_b{i}`` (all stride 16), plus ``res4`` aliased to the
TEST_BRANCH_IDX branch for the C4 ROI heads. See the package docstring for why
branches are feature levels here rather than a batch expansion.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from detectron2_tpu.modeling.backbone.resnet import RESNET_STAGES, BasicStem, BottleneckBlock
from detectron2_tpu.projects.tridentnet.trident_conv import TridentConv

__all__ = ["TridentBottleneckBlock", "TridentResNet", "build_trident_resnet_backbone"]


class TridentBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv is a TridentConv: takes and returns one
    tensor per branch; all parameters (convs, norms) shared across branches."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "BN"
    stride_in_1x1: bool = False
    dilations: Tuple[int, ...] = (1, 2, 3)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        conv1 = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            strides=stride_1x1,
            use_bias=False,
            norm=get_norm(self.norm, self.bottleneck_channels),
            activation=nn.relu,
            name="conv1",
        )
        outs = [conv1(x, train=train) for x in xs]

        outs = TridentConv(
            features=self.bottleneck_channels,
            kernel_size=3,
            strides=stride_3x3,
            dilations=self.dilations,
            name="conv2",
        )(outs)
        norm2 = get_norm(self.norm, self.bottleneck_channels)
        if norm2 is not None:
            norm2 = norm2(name="conv2_norm")
            outs = [norm2(o, train=train) for o in outs]
        outs = [nn.relu(o) for o in outs]

        conv3 = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            name="conv3",
        )
        outs = [conv3(o, train=train) for o in outs]

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                strides=self.stride,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name="shortcut",
            )
            shorts = [shortcut(x, train=train) for x in xs]
        else:
            shorts = list(xs)
        return [nn.relu(o + s) for o, s in zip(outs, shorts)]


class TridentResNet(Backbone):
    """ResNet-C4 trunk with a trident res4 stage."""

    stage_specs: Tuple  # stages res2..res4 (standard spec format for res2/3)
    stem_out_channels: int = 64
    norm: str = "FrozenBN"
    freeze_at: int = 0
    num_branch: int = 3
    branch_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    out_features: Tuple[str, ...] = ("res4",)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs = {}
        x = BasicStem(out_channels=self.stem_out_channels, norm=self.norm, name="stem")(
            x, train=train
        )
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        # res2, res3: standard bottleneck stages
        for stage_idx, blocks in zip((2, 3), self.stage_specs[:2]):
            for b, kwargs in enumerate(blocks):
                kw = dict(kwargs)
                kw.pop("block_class", None)
                x = BottleneckBlock(name=f"res{stage_idx}_{b}", **kw)(x, train=train)
            if self.freeze_at >= stage_idx:
                x = jax.lax.stop_gradient(x)
            if f"res{stage_idx}" in self.out_features:
                outputs[f"res{stage_idx}"] = x

        # res4: trident branches (shared weights, per-branch dilation)
        branches = [x] * self.num_branch
        for b, kwargs in enumerate(self.stage_specs[2]):
            kw = dict(kwargs)
            kw.pop("block_class", None)
            kw.pop("dilation", None)
            branches = TridentBottleneckBlock(
                dilations=tuple(self.branch_dilations), name=f"res4_{b}", **kw
            )(branches, train=train)

        for i, feat in enumerate(branches):
            outputs[f"res4_b{i}"] = feat
        outputs["res4"] = branches[self.test_branch_idx]
        return outputs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        ch = self.stage_specs[2][0]["out_channels"]
        shapes = {"res4": ShapeSpec(channels=ch, stride=16)}
        for i in range(self.num_branch):
            shapes[f"res4_b{i}"] = ShapeSpec(channels=ch, stride=16)
        ch2 = self.stage_specs[0][0]["out_channels"]
        shapes["res2"] = ShapeSpec(channels=ch2, stride=4)
        shapes["res3"] = ShapeSpec(channels=ch2 * 2, stride=8)
        return shapes

    @property
    def size_divisibility(self) -> int:
        return 16


@BACKBONE_REGISTRY.register()
def build_trident_resnet_backbone(cfg, input_shape: ShapeSpec = None) -> TridentResNet:
    """Create a TridentResNet from config (reference trident_backbone.py)."""
    from detectron2_tpu.modeling.backbone.resnet import make_stage_specs

    specs = make_stage_specs(cfg)[:3]  # res2, res3, res4
    specs_t = tuple(tuple(dict(b) for b in blocks) for blocks in specs)
    num_branch = cfg.MODEL.TRIDENT.NUM_BRANCH
    test_idx = cfg.MODEL.TRIDENT.TEST_BRANCH_IDX
    if test_idx < 0:
        test_idx = num_branch // 2
    return TridentResNet(
        stage_specs=specs_t,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        norm=cfg.MODEL.RESNETS.NORM,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        num_branch=num_branch,
        branch_dilations=tuple(cfg.MODEL.TRIDENT.BRANCH_DILATIONS),
        test_branch_idx=test_idx,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
    )
