from detectron2_tpu.structures.boxes import (
    Boxes,
    BoxMode,
    matched_pairwise_iou,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
    pairwise_point_box_distance,
)
from detectron2_tpu.structures.image_list import ImageList
from detectron2_tpu.structures.instances import Instances
from detectron2_tpu.structures.keypoints import Keypoints, heatmaps_to_keypoints
from detectron2_tpu.structures.masks import (
    BitMasks,
    PolygonMasks,
    ROIMasks,
    polygons_to_bitmask,
    rasterize_polygons_within_box,
)
from detectron2_tpu.structures.rotated_boxes import RotatedBoxes
from detectron2_tpu.structures.rotated_boxes import pairwise_iou as pairwise_iou_rotated

__all__ = [k for k in globals().keys() if not k.startswith("_")]
