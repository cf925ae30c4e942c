"""PointSup: point-supervised instance segmentation
(reference projects/PointSup/point_sup/).

Masks are trained from a handful of labeled points per instance instead of
dense masks. The batch contract adds two padded fields:
``gt_point_coords`` [B, G, P, 2] (absolute image xy) and ``gt_point_labels``
[B, G, P] in {1 fg, 0 bg, -1 pad/ignore}.
"""

from detectron2_tpu.projects.point_sup.config import add_point_sup_config
from detectron2_tpu.projects.point_sup.point_utils import get_point_coords_from_point_annotation
from detectron2_tpu.projects.point_sup.roi_heads import PointSupROIHeads

__all__ = [
    "add_point_sup_config",
    "get_point_coords_from_point_annotation",
    "PointSupROIHeads",
]
