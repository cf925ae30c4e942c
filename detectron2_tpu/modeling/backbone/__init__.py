from detectron2_tpu.modeling.backbone.backbone import Backbone
from detectron2_tpu.modeling.backbone.build import BACKBONE_REGISTRY, build_backbone
from detectron2_tpu.modeling.backbone.fpn import (
    FPN,
    LastLevelMaxPool,
    LastLevelP6P7,
    build_resnet_fpn_backbone,
    build_retinanet_resnet_fpn_backbone,
)
from detectron2_tpu.modeling.backbone.mvit import MViT
from detectron2_tpu.modeling.backbone.regnet import RegNet
from detectron2_tpu.modeling.backbone.resnet import (
    BasicBlock,
    BasicStem,
    BottleneckBlock,
    DeformBottleneckBlock,
    ResNet,
    build_resnet_backbone,
)
from detectron2_tpu.modeling.backbone.swin import SwinTransformer
from detectron2_tpu.modeling.backbone.vit import (
    SimpleFeaturePyramid,
    ViT,
    get_vit_lr_decay_rate,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
