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
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.PIXEL_STD = [57.375, 57.120, 58.395]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.CONV_DIMS = [-1, -1]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
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
