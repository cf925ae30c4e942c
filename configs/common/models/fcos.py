"""FCOS model (analogue of reference configs/common/models/fcos.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.modeling.meta_arch.fcos import FCOS


def build_fcos_r50(depth=50, num_classes=80):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CLASSES = num_classes
    cfg.MODEL.RETINANET.NUM_CONVS = 4
    return FCOS.from_config(cfg)


model = L(build_fcos_r50)()
