from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY, build_backbone
from detectron2_tpu.modeling.backbone.fpn import (
    FPN,
    LastLevelMaxPool,
    LastLevelP6P7,
    build_resnet_fpn_backbone,
    build_retinanet_resnet_fpn_backbone,
)
from detectron2_tpu.modeling.backbone.resnet import (
    BasicBlock,
    BasicStem,
    BottleneckBlock,
    DeformBottleneckBlock,
    ResNet,
    build_resnet_backbone,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
