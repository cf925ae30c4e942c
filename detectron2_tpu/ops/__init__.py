"""TPU compute kernels: fixed-shape XLA formulations + Pallas variants of the
ops the reference implements in CUDA (detectron2/layers/csrc/) or borrows from
torchvision."""

from detectron2_tpu.ops.nms import batched_nms, batched_nms_padded, nms, nms_padded
from detectron2_tpu.ops.paste_masks import paste_masks_in_image, paste_masks_probs
from detectron2_tpu.ops.roi_align import roi_align
from detectron2_tpu.ops.rotated_boxes_ops import (
    nms_rotated,
    nms_rotated_padded,
    pairwise_iou_rotated,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
