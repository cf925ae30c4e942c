"""PointRend: image segmentation as rendering
(reference projects/PointRend/point_rend/).

Importing this package registers ``PointRendROIHeads`` into
``ROI_HEADS_REGISTRY``. The rendering loop is re-designed for TPU: every
point budget (train sampling, subdivision refinement) is a static count, so
the whole refine loop compiles to fixed-shape top-k + gather + scatter.
"""

from detectron2_tpu.projects.point_rend.config import add_pointrend_config
from detectron2_tpu.projects.point_rend.point_features import (
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_sample,
    point_sample_fine_grained_features,
)
from detectron2_tpu.projects.point_rend.point_head import StandardPointHead
from detectron2_tpu.projects.point_rend.coarse_mask_head import CoarseMaskHead
from detectron2_tpu.projects.point_rend.roi_heads import ImplicitPointRendROIHeads, PointRendROIHeads
from detectron2_tpu.projects.point_rend.semantic_seg import (
    PointRendSemSegHead,
    calculate_uncertainty_sem_seg,
)

__all__ = [
    "PointRendSemSegHead",
    "calculate_uncertainty_sem_seg",
    "add_pointrend_config",
    "point_sample",
    "point_sample_fine_grained_features",
    "get_uncertain_point_coords_with_randomness",
    "get_uncertain_point_coords_on_grid",
    "StandardPointHead",
    "CoarseMaskHead",
    "PointRendROIHeads",
    "ImplicitPointRendROIHeads",
]
