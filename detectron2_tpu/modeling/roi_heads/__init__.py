from detectron2_tpu.modeling.roi_heads.box_head import (
    ROI_BOX_HEAD_REGISTRY,
    FastRCNNConvFCHead,
    build_box_head,
)
from detectron2_tpu.modeling.roi_heads.fast_rcnn import (
    FastRCNNOutputLayers,
    fast_rcnn_inference_padded,
)
from detectron2_tpu.modeling.roi_heads.keypoint_head import (
    ROI_KEYPOINT_HEAD_REGISTRY,
    KRCNNConvDeconvUpsampleHead,
    build_keypoint_head,
    keypoint_rcnn_inference,
    keypoint_rcnn_loss,
)
from detectron2_tpu.modeling.roi_heads.mask_head import (
    ROI_MASK_HEAD_REGISTRY,
    MaskRCNNConvUpsampleHead,
    build_mask_head,
    mask_rcnn_inference,
    mask_rcnn_loss,
)
from detectron2_tpu.modeling.roi_heads.cascade_rcnn import CascadeROIHeads
from detectron2_tpu.modeling.roi_heads.rotated_fast_rcnn import (
    RROIHeads,
    RotatedFastRCNNOutputLayers,
)
from detectron2_tpu.modeling.roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    Res5ROIHeads,
    StandardROIHeads,
    build_roi_heads,
    label_and_sample_proposals_padded,
    select_foreground_slots,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
