"""Panoptic FPN R50 1x (lazy; analogue of reference
COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.py)."""

from ..common.coco_schedule import lr_multiplier_1x as lr_multiplier  # noqa
from ..common.data.coco_panoptic_separated import dataloader  # noqa
from ..common.models.panoptic_fpn import model  # noqa
from ..common.optim import SGD as optimizer  # noqa
from ..common.train import train  # noqa

train.init_checkpoint = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
