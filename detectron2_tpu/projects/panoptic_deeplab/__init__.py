"""Panoptic-DeepLab (reference projects/Panoptic-DeepLab/panoptic_deeplab/):
bottom-up panoptic segmentation via semantic logits + instance center heatmap
+ center-offset regression.

The grouping post-processor is re-designed for TPU: a static budget of K
candidate centers (top-K after maxpool-NMS) and a dense [H*W, K] distance
argmin replace the reference's dynamic nonzero()-based grouping — one fused
fixed-shape program instead of host loops.
"""

from detectron2_tpu.projects.panoptic_deeplab.config import add_panoptic_deeplab_config
from detectron2_tpu.projects.panoptic_deeplab.panoptic_seg import (
    PanopticDeepLab,
    PanopticDeepLabInsEmbedHead,
    PanopticDeepLabSemSegHead,
)
from detectron2_tpu.projects.panoptic_deeplab.post_processing import (
    find_instance_center,
    get_panoptic_segmentation,
    group_pixels,
    panoptic_deeplab_postprocess,
)
from detectron2_tpu.projects.panoptic_deeplab.target_generator import (
    PanopticDeepLabTargetGenerator,
)

__all__ = [
    "add_panoptic_deeplab_config",
    "PanopticDeepLab",
    "PanopticDeepLabSemSegHead",
    "PanopticDeepLabInsEmbedHead",
    "find_instance_center",
    "group_pixels",
    "get_panoptic_segmentation",
    "panoptic_deeplab_postprocess",
    "PanopticDeepLabTargetGenerator",
]
