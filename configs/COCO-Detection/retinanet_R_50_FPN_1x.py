"""RetinaNet R50 1x (lazy; analogue of reference
COCO-Detection/retinanet_R_50_FPN_1x.py)."""

from ..common.coco_schedule import lr_multiplier_1x as lr_multiplier  # noqa
from ..common.data.coco import dataloader  # noqa
from ..common.models.retinanet import model  # noqa
from ..common.optim import SGD as optimizer  # noqa
from ..common.train import train  # noqa

dataloader.train.mapper.use_instance_mask = False
optimizer.lr_schedule = 0.01
train.init_checkpoint = "detectron2://ImageNetPretrained/MSRA/R-50.pkl"
