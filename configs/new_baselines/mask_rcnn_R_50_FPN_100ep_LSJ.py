"""Mask R-CNN R50-FPN, LSJ 1024x1024, 100 epochs from scratch
(analogue of reference new_baselines/mask_rcnn_R_50_FPN_100ep_LSJ.py)."""

from detectron2_tpu.config import LazyCall as L, get_cfg
from detectron2_tpu.data import transforms as T
from detectron2_tpu.modeling import GeneralizedRCNN
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from ..common.data.coco import dataloader
from ..common.optim import SGD as optimizer
from ..common.train import train


def build_lsj_model(depth=50, norm="SyncBN"):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0  # train from scratch
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.RESNETS.NORM = norm
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.NORM = norm
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.CONV_DIMS = [-1, -1]  # 2-conv RPN head (TF TPU Mask R-CNN recipe)
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    # 4conv1fc box head
    cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    # Base-RCNN-FPN values the reference's lazy mask_rcnn_fpn model inherits
    # (reference common/models/mask_rcnn_fpn.py:59,76: box pooler 7, 4-conv
    # mask head); yacs defaults are 14 / 0
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.ROI_BOX_HEAD.NORM = norm
    cfg.MODEL.ROI_MASK_HEAD.NORM = norm
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.PIXEL_STD = [57.375, 57.120, 58.395]
    return GeneralizedRCNN.from_config(cfg)


model = L(build_lsj_model)()

# large-scale jitter 0.1-2.0 onto a fixed 1024 square
image_size = 1024
dataloader.train.mapper.augmentations = [
    L(T.ResizeScale)(
        min_scale=0.1, max_scale=2.0, target_height=image_size, target_width=image_size
    ),
    L(T.FixedSizeCrop)(crop_size=(image_size, image_size)),
    L(T.RandomFlip)(horizontal=True),
]
dataloader.train.mapper.recompute_boxes = True
dataloader.train.total_batch_size = 64

train.init_checkpoint = ""
train.max_iter = 184375  # 100 ep = 184375 iters * 64 img/iter / 118k img/ep

lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[163889, 177546],
            num_updates=train["max_iter"],
        ),
        warmup_length=500 / train["max_iter"],
        warmup_factor=0.067,
    ),
    max_iter=train["max_iter"],
    base_lr=0.1,
)

optimizer.lr_schedule = 0.1
optimizer.weight_decay = 4e-5
