"""Layers: the framework analogue of detectron2/layers — norms, conv wrappers,
losses, shape specs, and re-exports of the TPU kernels in detectron2_tpu.ops."""

from detectron2_tpu.layers.aspp import ASPP
from detectron2_tpu.layers.batch_norm import (
    BatchNorm,
    CycleBatchNormList,
    FrozenBatchNorm2d,
    GroupNorm,
    LayerNorm,
    NaiveSyncBatchNorm,
    SyncBatchNorm,
    get_norm,
)
from detectron2_tpu.layers.blocks import CNNBlockBase, DepthwiseSeparableConv2d, DropPath
from detectron2_tpu.layers.deform_conv import DeformConv, ModulatedDeformConv
from detectron2_tpu.layers.losses import (
    ciou_loss,
    cross_entropy,
    diou_loss,
    giou_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.layers.wrappers import (
    Conv2d,
    ConvTranspose2d,
    cat,
    move_device_like,
    nonzero_tuple,
    shapes_to_tensor,
)

# kernels (reference layers/nms.py, roi_align.py, mask_ops.py equivalents)
from detectron2_tpu.ops.deform_conv import deform_conv2d
from detectron2_tpu.ops.nms import batched_nms, batched_nms_padded, nms, nms_padded
from detectron2_tpu.ops.paste_masks import paste_masks_in_image
from detectron2_tpu.ops.roi_align import roi_align
from detectron2_tpu.ops.rotated_boxes_ops import (
    nms_rotated,
    nms_rotated_padded,
    pairwise_iou_rotated,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
