"""MViTv2 LSJ COCO loader (analogue of reference
projects/MViTv2/configs/common/coco_loader_lsj.py): large-scale jitter
0.1-2.0 onto a fixed 1024 square."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.data import transforms as T

from .coco_loader import dataloader

image_size = 1024
dataloader.train.mapper.augmentations = [
    L(T.RandomFlip)(horizontal=True),
    L(T.ResizeScale)(
        min_scale=0.1, max_scale=2.0, target_height=image_size, target_width=image_size
    ),
    L(T.FixedSizeCrop)(crop_size=(image_size, image_size)),
]
dataloader.train.mapper.recompute_boxes = True
dataloader.train.total_batch_size = 64
dataloader.test.mapper.augmentations = [
    L(T.ResizeShortestEdge)(short_edge_length=image_size, max_size=image_size)
]
