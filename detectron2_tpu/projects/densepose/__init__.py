"""DensePose (reference projects/DensePose/densepose/): dense human surface
correspondence — per-pixel body-part index I and per-part (U, V) chart
coordinates predicted per detected person.

Round-1 scope: the chart-based baseline (DensePoseChartHead + point-supervised
IUV losses + the ROI heads wiring). DensePose ground truth IS a sparse point
annotation set (~100 points/person), so the TPU formulation samples predicted
IUV maps at the annotated points with the shared point_sample primitive —
no dense rasterization. CSE embeddings, confidences, and the DensePose-specific
evaluators (GPS/GPSM) are not yet implemented.

Batch contract (train), padded per instance with P point slots:
``gt_dp_points`` [B, G, P, 2] absolute xy, ``gt_dp_part`` [B, G, P] int in
[0, 24] (-1 pad), ``gt_dp_u`` / ``gt_dp_v`` [B, G, P] float in [0, 1].
"""

from detectron2_tpu.projects.densepose.config import add_densepose_config
from detectron2_tpu.projects.densepose.densepose_head import DensePoseChartHead
from detectron2_tpu.projects.densepose.roi_heads import DensePoseROIHeads

__all__ = ["add_densepose_config", "DensePoseChartHead", "DensePoseROIHeads"]
