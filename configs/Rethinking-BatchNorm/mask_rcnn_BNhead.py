"""Mask R-CNN with BatchNorm in the box/mask heads
(analogue of reference projects/Rethinking-BatchNorm/configs/mask_rcnn_BNhead.py)."""

from ..common.coco_schedule import lr_multiplier_3x as lr_multiplier  # noqa
from ..common.data.coco import dataloader  # noqa
from ..common.models.mask_rcnn_fpn import model  # noqa
from ..common.optim import SGD as optimizer  # noqa

model.backbone.bottom_up.freeze_at = 2
model.roi_heads.box_head.conv_norm = model.roi_heads.mask_head.conv_norm = "BN"
# 4conv1fc box head
model.roi_heads.box_head.conv_dims = (256, 256, 256, 256)
model.roi_heads.box_head.fc_dims = (1024,)

train = dict(
    output_dir="./output/mask_rcnn_BNhead",
    init_checkpoint="detectron2://ImageNetPretrained/MSRA/R-50.pkl",
    max_iter=270000,
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)
