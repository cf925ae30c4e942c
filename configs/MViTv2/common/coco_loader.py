"""Shared MViTv2 COCO input settings (analogue of reference
projects/MViTv2/configs/common/coco_loader.py): large-scale jitter to a fixed
1024 square — on TPU this is exactly the fixed-shape batch contract."""

image_size = 1024
