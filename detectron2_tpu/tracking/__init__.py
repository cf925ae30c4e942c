from detectron2_tpu.tracking.base_tracker import (
    TRACKER_HEADS_REGISTRY,
    BaseTracker,
    build_tracker_head,
)
from detectron2_tpu.tracking.bbox_iou_tracker import BBoxIOUTracker
from detectron2_tpu.tracking.hungarian_tracker import (
    BaseHungarianTracker,
    IOUWeightedHungarianBBoxIOUTracker,
    VanillaHungarianBBoxIOUTracker,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
from detectron2_tpu.tracking.utils import LARGE_COST_VALUE, create_prediction_pairs  # noqa

__all__ = [k for k in globals().keys() if not k.startswith("_")]
