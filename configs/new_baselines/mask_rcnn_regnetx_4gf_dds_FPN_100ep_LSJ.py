"""Mask R-CNN RegNetX-4GF LSJ 100ep (analogue of reference
new_baselines/mask_rcnn_regnetx_4gf_dds_FPN_100ep_LSJ.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.modeling import GeneralizedRCNN
from detectron2_tpu.modeling.backbone import FPN, LastLevelMaxPool
from detectron2_tpu.modeling.backbone.regnet import RegNet

from .mask_rcnn_R_50_FPN_100ep_LSJ import (  # noqa
    dataloader,
    lr_multiplier,
    optimizer,
    train,
)


def build_regnet_lsj():
    cfg = get_cfg()
    # base heads are built against a throwaway R50-FPN (p2-p6 shapes match
    # the RegNet FPN's 256-channel outputs); the real backbone is swapped in
    # below via .clone
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.PIXEL_STD = [57.375, 57.120, 58.395]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.CONV_DIMS = [-1, -1]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    # Base-RCNN-FPN values the reference's lazy mask_rcnn_fpn model inherits
    # (reference common/models/mask_rcnn_fpn.py:59,76: box pooler 7, 4-conv
    # mask head); yacs defaults are 14 / 0
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_BOX_HEAD.NORM = "SyncBN"
    cfg.MODEL.ROI_MASK_HEAD.NORM = "SyncBN"
    base = GeneralizedRCNN.from_config(cfg)
    bottom_up = RegNet(
        w_a=38.65, w_0=96, w_m=2.43, depth=23, group_width=40,
        se_ratio=0.0, norm="SyncBN",
        out_features=("s1", "s2", "s3", "s4"),
    )
    backbone = FPN(
        bottom_up=bottom_up,
        in_features=("s1", "s2", "s3", "s4"),
        out_channels=256,
        norm="SyncBN",
        top_block=LastLevelMaxPool(),
    )
    return base.clone(backbone=backbone)


model = L(build_regnet_lsj)()
