"""Hungarian-assignment trackers (reference detectron2/tracking/hungarian_tracker.py,
vanilla_hungarian_bbox_iou_tracker.py, iou_weighted_hungarian_bbox_iou_tracker.py)."""

import copy
from typing import Dict

import numpy as np
from scipy.optimize import linear_sum_assignment

from detectron2_tpu.config import CfgNode, configurable
from detectron2_tpu.structures import Boxes, Instances
from detectron2_tpu.structures.boxes import pairwise_iou
from detectron2_tpu.tracking.base_tracker import TRACKER_HEADS_REGISTRY
from detectron2_tpu.tracking.bbox_iou_tracker import BBoxIOUTracker

__all__ = ["BaseHungarianTracker", "VanillaHungarianBBoxIOUTracker", "IOUWeightedHungarianBBoxIOUTracker"]


class BaseHungarianTracker(BBoxIOUTracker):
    """Tracker matching detections with the Hungarian algorithm on a cost
    matrix subclass-defined from bbox IoU."""

    def update(self, instances: Instances) -> Instances:
        if instances.has("pred_keypoints"):
            raise NotImplementedError("Need to add support for keypoints")
        instances = self._initialize_extra_fields(instances)
        if self._prev_instances is not None and len(self._prev_instances) and len(instances):
            self._untracked_prev_idx = set(range(len(self._prev_instances)))
            cost_matrix = self.build_cost_matrix(instances, self._prev_instances)
            matched_i, matched_j = linear_sum_assignment(cost_matrix)
            self._matched_idx = set()
            self._matched_ID = set()
            for i, j in zip(matched_i, matched_j):
                if cost_matrix[i, j] >= 0:  # no overlap -> don't match
                    continue
                instances.ID[i] = self._prev_instances.ID[j]
                instances.ID_period[i] = self._prev_instances.ID_period[j] + 1
                instances.lost_frame_count[i] = 0
                self._matched_idx.add(i)
                self._matched_ID.add(self._prev_instances.ID[j])
                self._untracked_prev_idx.discard(j)
            instances = self._assign_new_id(instances)
            instances = self._merge_untracked_instances(instances)
        self._prev_instances = copy.deepcopy(instances)
        return instances

    def build_cost_matrix(self, instances: Instances, prev_instances: Instances) -> np.ndarray:
        raise NotImplementedError


@TRACKER_HEADS_REGISTRY.register()
class VanillaHungarianBBoxIOUTracker(BaseHungarianTracker):
    """cost = -1 where IoU >= threshold else 0."""

    def build_cost_matrix(self, instances, prev_instances) -> np.ndarray:
        iou_all = np.asarray(pairwise_iou(instances.pred_boxes, prev_instances.pred_boxes))
        bbox_pairs = self._create_prediction_pairs(instances, iou_all)
        cost_matrix = np.full((len(instances), len(prev_instances)), 0.0)
        return self.assign_cost_matrix_values(cost_matrix, bbox_pairs)

    def assign_cost_matrix_values(self, cost_matrix: np.ndarray, bbox_pairs) -> np.ndarray:
        for pair in bbox_pairs:
            if pair["IoU"] >= self._track_iou_threshold:
                cost_matrix[pair["idx"]][pair["prev_idx"]] = -1
        return cost_matrix


@TRACKER_HEADS_REGISTRY.register()
class IOUWeightedHungarianBBoxIOUTracker(VanillaHungarianBBoxIOUTracker):
    """cost = -IoU where IoU >= threshold else 0."""

    def assign_cost_matrix_values(self, cost_matrix: np.ndarray, bbox_pairs) -> np.ndarray:
        for pair in bbox_pairs:
            if pair["IoU"] >= self._track_iou_threshold:
                cost_matrix[pair["idx"]][pair["prev_idx"]] = -pair["IoU"]
        return cost_matrix
