"""Panoptic FPN (analogue of reference
configs/common/models/panoptic_fpn.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.modeling.meta_arch.panoptic_fpn import PanopticFPN


def build_panoptic_fpn(depth=50):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT = 0.5
    return PanopticFPN.from_config(cfg)


model = L(build_panoptic_fpn)()
