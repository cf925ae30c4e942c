"""ResNet / ResNeXt backbone, NHWC flax (reference detectron2/modeling/backbone/resnet.py).

Structure mirrors the reference (BasicStem :330, BasicBlock, BottleneckBlock
:100, DeformBottleneckBlock :213, stage builder :493, build_resnet_backbone
:614) including the Caffe2-era quirks needed for zoo-weight parity:
``stride_in_1x1``, FrozenBN default, DC5 dilation, freeze_at.

TPU design notes:
- channels-last everywhere; convs hit the MXU directly.
- "freezing" = stop_gradient on the frozen prefix's outputs (params upstream
  get exactly zero gradient) + FrozenBN statistics.
- parameter scopes are named to mirror d2 module paths (stem.conv1,
  res2.0.conv1, ...) so the d2 .pkl checkpoint converter is a mechanical
  rename (flax separators: res2_0 etc.).
"""

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.config import configurable
from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY

__all__ = [
    "BasicStem",
    "BasicBlock",
    "BottleneckBlock",
    "DeformBottleneckBlock",
    "ResNet",
    "build_resnet_backbone",
    "make_stage_specs",
]


class BasicStem(nn.Module):
    """7x7 conv stride 2 + norm + relu + 3x3 maxpool stride 2 (stride 4 total)."""

    out_channels: int = 64
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(
            features=self.out_channels,
            kernel_size=7,
            strides=2,
            padding=3,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            activation=nn.relu,
            name="conv1",
        )(x, train=train)
        # torch maxpool(k=3, s=2, p=1) pads with -inf conceptually; jax SAME on
        # even inputs matches the torch geometry here, use explicit padding.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    @property
    def stride(self) -> int:
        return 4


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual (ResNet-18/34)."""

    in_channels: int
    out_channels: int
    stride: int = 1
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            strides=self.stride,
            padding=1,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            activation=nn.relu,
            name="conv1",
        )(x, train=train)
        out = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            strides=1,
            padding=1,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            name="conv2",
        )(out, train=train)

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                strides=self.stride,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name="shortcut",
            )(x, train=train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with residual (ResNet>=50).

    ``stride_in_1x1``: Caffe2-style models place the stride on the first 1x1
    conv instead of the 3x3 (reference resnet.py:129-140) — required for zoo
    weight parity.
    """

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "BN"
    stride_in_1x1: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            strides=stride_1x1,
            use_bias=False,
            norm=get_norm(self.norm, self.bottleneck_channels),
            activation=nn.relu,
            name="conv1",
        )(x, train=train)
        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=3,
            strides=stride_3x3,
            padding=self.dilation,
            dilation=self.dilation,
            groups=self.num_groups,
            use_bias=False,
            norm=get_norm(self.norm, self.bottleneck_channels),
            activation=nn.relu,
            name="conv2",
        )(out, train=train)
        out = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            name="conv3",
        )(out, train=train)

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                strides=self.stride,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name="shortcut",
            )(x, train=train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class DeformBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv is a (modulated) deformable conv
    (reference resnet.py:213-328); offsets/masks predicted by a plain conv."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "BN"
    stride_in_1x1: bool = False
    dilation: int = 1
    deform_modulated: bool = False
    deform_num_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from detectron2_tpu.ops.deform_conv import deform_conv2d

        stride_1x1, stride_3x3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            strides=stride_1x1,
            use_bias=False,
            norm=get_norm(self.norm, self.bottleneck_channels),
            activation=nn.relu,
            name="conv1",
        )(x, train=train)

        # offset predictor (zero-init so the block starts as a plain conv)
        offset_channels = (27 if self.deform_modulated else 18) * self.deform_num_groups
        offset_out = nn.Conv(
            features=offset_channels,
            kernel_size=(3, 3),
            strides=(stride_3x3, stride_3x3),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=out.dtype,
            name="conv2_offset",
        )(out)

        K = 9 * self.deform_num_groups
        if self.deform_modulated:
            offset = offset_out[..., : 2 * K]
            mask = jax.nn.sigmoid(offset_out[..., 2 * K :])
        else:
            offset = offset_out
            mask = None

        weight = self.param(
            "conv2_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (3, 3, self.bottleneck_channels // self.num_groups, self.bottleneck_channels),
        )
        out = deform_conv2d(
            out,
            offset,
            weight.astype(out.dtype),
            mask=mask,
            stride=stride_3x3,
            padding=self.dilation,
            dilation=self.dilation,
            groups=self.num_groups,
            deformable_groups=self.deform_num_groups,
        )
        norm2 = get_norm(self.norm, self.bottleneck_channels)
        if norm2 is not None:
            out = norm2(name="conv2_norm")(out, train=train)
        out = nn.relu(out)

        out = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=get_norm(self.norm, self.out_channels),
            name="conv3",
        )(out, train=train)

        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                strides=self.stride,
                use_bias=False,
                norm=get_norm(self.norm, self.out_channels),
                name="shortcut",
            )(x, train=train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


# (num blocks per stage) for each supported depth (reference resnet.py:620)
RESNET_STAGES = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


def make_stage_specs(cfg) -> List[List[Dict[str, Any]]]:
    """Compute per-block constructor kwargs for all 4 stages from cfg
    (mirrors the geometry logic of reference build_resnet_backbone :614-693)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    norm = cfg.MODEL.RESNETS.NORM
    num_blocks_per_stage = RESNET_STAGES[depth]
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    bottleneck_channels = num_groups * width_per_group
    in_channels = cfg.MODEL.RESNETS.STEM_OUT_CHANNELS
    out_channels = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    res5_dilation = cfg.MODEL.RESNETS.RES5_DILATION
    deform_on_per_stage = cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE
    deform_modulated = cfg.MODEL.RESNETS.DEFORM_MODULATED
    deform_num_groups = cfg.MODEL.RESNETS.DEFORM_NUM_GROUPS
    assert res5_dilation in {1, 2}, f"res5_dilation cannot be {res5_dilation}."

    if depth in [18, 34]:
        assert out_channels == 64, "Must set MODEL.RESNETS.RES2_OUT_CHANNELS = 64 for R18/R34"
        assert not any(deform_on_per_stage), "MODEL.RESNETS.DEFORM_ON_PER_STAGE unsupported for R18/R34"
        assert res5_dilation == 1, "Must set MODEL.RESNETS.RES5_DILATION = 1 for R18/R34"
        assert num_groups == 1, "Must set MODEL.RESNETS.NUM_GROUPS = 1 for R18/R34"

    stages = []
    for idx, stage_idx in enumerate(range(2, 6)):
        # res5_dilation trades the res5 stride for dilation (DC5 models)
        dilation = res5_dilation if stage_idx == 5 else 1
        first_stride = 1 if idx == 0 or (stage_idx == 5 and dilation == 2) else 2
        blocks = []
        for b in range(num_blocks_per_stage[idx]):
            kwargs: Dict[str, Any] = {
                "in_channels": in_channels if b == 0 else out_channels,
                "out_channels": out_channels,
                "stride": first_stride if b == 0 else 1,
                "norm": norm,
            }
            if depth in [18, 34]:
                kwargs["block_class"] = BasicBlock
            else:
                kwargs.update(
                    bottleneck_channels=bottleneck_channels,
                    stride_in_1x1=stride_in_1x1,
                    dilation=dilation,
                    num_groups=num_groups,
                )
                if deform_on_per_stage[idx]:
                    kwargs["block_class"] = DeformBottleneckBlock
                    kwargs["deform_modulated"] = deform_modulated
                    kwargs["deform_num_groups"] = deform_num_groups
                else:
                    kwargs["block_class"] = BottleneckBlock
            blocks.append(kwargs)
        stages.append(blocks)
        in_channels = out_channels
        out_channels *= 2
        bottleneck_channels *= 2
    return stages


class ResNet(Backbone):
    """The full ResNet backbone returning a dict of stage outputs."""

    stage_specs: Tuple  # tuple of tuples of per-block kwargs (hashable form)
    stem_out_channels: int = 64
    norm: str = "FrozenBN"
    out_features: Tuple[str, ...] = ("res4",)
    freeze_at: int = 0
    num_classes: Optional[int] = None  # classification head (for pretraining parity)
    stem_class: Any = None  # alternative stem module class (e.g. DeepLabStem)

    def setup(self):
        stem_cls = self.stem_class or BasicStem
        self.stem = stem_cls(out_channels=self.stem_out_channels, norm=self.norm)
        stages = []
        for stage_idx, blocks in enumerate(self.stage_specs, start=2):
            mods = []
            for b, kwargs in enumerate(blocks):
                kw = dict(kwargs)
                block_class = kw.pop("block_class")
                mods.append(block_class(name=f"res{stage_idx}_{b}", **kw))
            stages.append(tuple(mods))
        self.stages = tuple(stages)
        if self.num_classes is not None:
            self.linear = nn.Dense(self.num_classes, name="linear")

    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs = {}
        x = self.stem(x, train=train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x
        for stage_idx, blocks in enumerate(self.stages, start=2):
            for block in blocks:
                x = block(x, train=train)
            if self.freeze_at >= stage_idx:
                x = jax.lax.stop_gradient(x)
            name = f"res{stage_idx}"
            if name in self.out_features:
                outputs[name] = x
        if self.num_classes is not None:
            x = jnp.mean(x, axis=(1, 2))
            outputs["linear"] = self.linear(x)
        return outputs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        shapes = {}
        channels = {"stem": self.stem_out_channels}
        strides = {"stem": 4}
        stride = 4
        for stage_idx, blocks in enumerate(self.stage_specs, start=2):
            name = f"res{stage_idx}"
            first = blocks[0]
            stride *= first["stride"]
            # all blocks in a stage share out_channels
            channels[name] = first["out_channels"]
            strides[name] = stride
        for f in self.out_features:
            shapes[f] = ShapeSpec(channels=channels[f], stride=strides[f])
        return shapes

    @property
    def size_divisibility(self) -> int:
        # the deepest produced stride
        stride = 4
        for blocks in self.stage_specs:
            stride *= blocks[0]["stride"]
        return stride


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg, input_shape: ShapeSpec = None) -> ResNet:
    """Create a ResNet from config (reference resnet.py:614)."""
    specs = make_stage_specs(cfg)
    # only build stages up to the deepest requested feature (reference
    # resnet.py:632-640) — a C4 model with OUT_FEATURES=["res4"] must not
    # instantiate res5 (its weights live in Res5ROIHeads instead)
    out_features = tuple(cfg.MODEL.RESNETS.OUT_FEATURES)
    max_stage = max(
        {"stem": 1, "res2": 2, "res3": 3, "res4": 4, "res5": 5}[f] for f in out_features
    )
    specs = specs[: max(0, max_stage - 1)]
    # flax dataclass fields must be hashable-ish; store as tuple of tuples of dicts
    specs_t = tuple(tuple(dict(b) for b in blocks) for blocks in specs)
    return ResNet(
        stage_specs=specs_t,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
    )
