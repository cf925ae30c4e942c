"""Mask R-CNN R50-FPN 1x (lazy; analogue of reference
COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.py)."""

from ..common.coco_schedule import lr_multiplier_1x as lr_multiplier  # noqa
from ..common.data.coco import dataloader  # noqa
from ..common.models.mask_rcnn_fpn import model  # noqa
from ..common.optim import SGD as optimizer  # noqa
from ..common.train import train  # noqa

train.init_checkpoint = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
