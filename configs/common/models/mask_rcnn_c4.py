"""Mask R-CNN R50-C4 (analogue of reference
configs/common/models/mask_rcnn_c4.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.modeling import GeneralizedRCNN


def build_mask_rcnn_c4(depth=50, num_classes=80, mask_on=True):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 6000
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.MODEL.MASK_ON = mask_on
    return GeneralizedRCNN.from_config(cfg)


model = L(build_mask_rcnn_c4)()
