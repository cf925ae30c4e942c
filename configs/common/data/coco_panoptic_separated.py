"""COCO panoptic-separated loaders (analogue of reference
configs/common/data/coco_panoptic_separated.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.evaluation import (
    COCOEvaluator,
    COCOPanopticEvaluator,
    DatasetEvaluators,
    SemSegEvaluator,
)

from .coco import dataloader

dataloader.train.dataset.names = "coco_2017_train_panoptic_separated"
dataloader.train.dataset.filter_empty = False
dataloader.test.dataset.names = "coco_2017_val_panoptic_separated"


dataloader.evaluator = [
    L(COCOEvaluator)(dataset_name="coco_2017_val_panoptic_separated"),
    L(SemSegEvaluator)(dataset_name="coco_2017_val_panoptic_separated"),
    L(COCOPanopticEvaluator)(dataset_name="coco_2017_val_panoptic_separated"),
]
