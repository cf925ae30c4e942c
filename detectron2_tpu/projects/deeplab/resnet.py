"""DeepLab ResNet variant (reference projects/DeepLab/deeplab/resnet.py):
a deeper 3x3 stem and dilated res4/res5 with multi-grid dilations."""

from typing import List

from flax import linen as nn

from detectron2_tpu.layers.batch_norm import get_norm
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import Conv2d
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from detectron2_tpu.modeling.backbone.resnet import (
    RESNET_STAGES,
    BottleneckBlock,
    DeformBottleneckBlock,
    ResNet,
)

__all__ = ["DeepLabStem", "build_resnet_deeplab_backbone"]


class DeepLabStem(nn.Module):
    """Three 3x3 convs (the first stride-2) + maxpool: stride 4 total, like
    BasicStem but with more capacity at high resolution."""

    out_channels: int = 128
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        for i, (ch, stride) in enumerate([(half, 2), (half, 1), (self.out_channels, 1)]):
            x = Conv2d(
                features=ch,
                kernel_size=3,
                strides=stride,
                padding=1,
                use_bias=False,
                norm=get_norm(self.norm, ch),
                activation=nn.relu,
                name=f"conv{i + 1}",
            )(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    @property
    def stride(self) -> int:
        return 4


@BACKBONE_REGISTRY.register()
def build_resnet_deeplab_backbone(cfg, input_shape: ShapeSpec = None) -> ResNet:
    """ResNet with RES4_DILATION / RES5_DILATION + RES5_MULTI_GRID; output
    stride 8 (res4_dilation=2) or 16 (res5_dilation=2)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    norm = cfg.MODEL.RESNETS.NORM
    num_blocks_per_stage = RESNET_STAGES[depth]
    num_groups = cfg.MODEL.RESNETS.NUM_GROUPS
    width_per_group = cfg.MODEL.RESNETS.WIDTH_PER_GROUP
    bottleneck_channels = num_groups * width_per_group
    in_channels = cfg.MODEL.RESNETS.STEM_OUT_CHANNELS
    out_channels = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    stride_in_1x1 = cfg.MODEL.RESNETS.STRIDE_IN_1X1
    res4_dilation = cfg.MODEL.RESNETS.RES4_DILATION
    res5_dilation = cfg.MODEL.RESNETS.RES5_DILATION
    multi_grid: List[int] = list(cfg.MODEL.RESNETS.RES5_MULTI_GRID)
    deform_on_per_stage = cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE
    assert res4_dilation in {1, 2}, f"res4_dilation cannot be {res4_dilation}."
    assert res5_dilation in {1, 2, 4}, f"res5_dilation cannot be {res5_dilation}."
    if res4_dilation == 2:
        assert res5_dilation == 4, "res5 must dilate 4x when res4 dilates 2x"
    assert depth not in (18, 34), "DeepLab backbone requires bottleneck ResNets"

    stages = []
    for idx, stage_idx in enumerate(range(2, 6)):
        if stage_idx == 4:
            dilation = res4_dilation
        elif stage_idx == 5:
            dilation = res5_dilation
        else:
            dilation = 1
        first_stride = 1 if idx == 0 or dilation > 1 else 2
        blocks = []
        for b in range(num_blocks_per_stage[idx]):
            # multi-grid scales the res5 per-block dilation (e.g. [1, 2, 4])
            block_dilation = (
                dilation * multi_grid[b % len(multi_grid)] if stage_idx == 5 else dilation
            )
            kwargs = {
                "in_channels": in_channels if b == 0 else out_channels,
                "out_channels": out_channels,
                "stride": first_stride if b == 0 else 1,
                "norm": norm,
                "bottleneck_channels": bottleneck_channels,
                "stride_in_1x1": stride_in_1x1,
                "dilation": block_dilation,
                "num_groups": num_groups,
                "block_class": (
                    DeformBottleneckBlock if deform_on_per_stage[idx] else BottleneckBlock
                ),
            }
            if deform_on_per_stage[idx]:
                kwargs["deform_modulated"] = cfg.MODEL.RESNETS.DEFORM_MODULATED
                kwargs["deform_num_groups"] = cfg.MODEL.RESNETS.DEFORM_NUM_GROUPS
            blocks.append(kwargs)
        stages.append(tuple(blocks))
        in_channels = out_channels
        out_channels *= 2
        bottleneck_channels *= 2

    stem_type = cfg.MODEL.RESNETS.get("STEM_TYPE", "basic")
    return ResNet(
        stage_specs=tuple(stages),
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        norm=norm,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        stem_class=DeepLabStem if stem_type == "deeplab" else None,
    )
