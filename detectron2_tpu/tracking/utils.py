"""Tracking helpers (reference detectron2/tracking/utils.py)."""

from typing import List

import numpy as np

from detectron2_tpu.structures import Instances

__all__ = ["create_prediction_pairs", "LARGE_COST_VALUE"]

LARGE_COST_VALUE = 100000


def create_prediction_pairs(
    instances: Instances,
    prev_instances: Instances,
    iou_all: np.ndarray,
    threshold: float = 0.5,
) -> List:
    """Enumerate (current, previous) box pairs whose IoU clears `threshold`.

    Returns a list of dicts with idx / prev_idx / prev_id / IoU / prev_period,
    the format the Hungarian trackers consume (reference utils.py:8-37).
    """
    bbox_pairs = []
    iou_all = np.asarray(iou_all)
    for i in range(len(instances)):
        for j in range(len(prev_instances)):
            if iou_all[i, j] < threshold:
                continue
            bbox_pairs.append(
                {
                    "idx": i,
                    "prev_idx": j,
                    "prev_id": prev_instances.ID[j],
                    "IoU": iou_all[i, j],
                    "prev_period": prev_instances.ID_period[j],
                }
            )
    return bbox_pairs
