"""RetinaNet R50-FPN model (analogue of reference
configs/common/models/retinanet.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.modeling.meta_arch.retinanet import RetinaNet


def build_retinanet_r50(depth=50, num_classes=80):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = num_classes
    return RetinaNet.from_config(cfg)


model = L(build_retinanet_r50)()
