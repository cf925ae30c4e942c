"""IoU-based greedy tracker (reference detectron2/tracking/bbox_iou_tracker.py)."""

import copy
from typing import List

import numpy as np

from detectron2_tpu.config import CfgNode, configurable
from detectron2_tpu.structures import Boxes, Instances
from detectron2_tpu.structures.boxes import pairwise_iou
from detectron2_tpu.tracking.base_tracker import TRACKER_HEADS_REGISTRY, BaseTracker

__all__ = ["BBoxIOUTracker"]


@TRACKER_HEADS_REGISTRY.register()
class BBoxIOUTracker(BaseTracker):
    """Match current detections to previous frame's by greedy bbox IoU."""

    @configurable
    def __init__(
        self,
        *,
        video_height: int,
        video_width: int,
        max_num_instances: int = 200,
        max_lost_frame_count: int = 0,
        min_box_rel_dim: float = 0.02,
        min_instance_period: int = 1,
        track_iou_threshold: float = 0.5,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._video_height = video_height
        self._video_width = video_width
        self._max_num_instances = max_num_instances
        self._max_lost_frame_count = max_lost_frame_count
        self._min_box_rel_dim = min_box_rel_dim
        self._min_instance_period = min_instance_period
        self._track_iou_threshold = track_iou_threshold

    @classmethod
    def from_config(cls, cfg: CfgNode):
        assert "VIDEO_HEIGHT" in cfg.TRACKER_HEADS
        assert "VIDEO_WIDTH" in cfg.TRACKER_HEADS
        return {
            "video_height": cfg.TRACKER_HEADS.get("VIDEO_HEIGHT"),
            "video_width": cfg.TRACKER_HEADS.get("VIDEO_WIDTH"),
            "max_num_instances": cfg.TRACKER_HEADS.get("MAX_NUM_INSTANCES", 200),
            "max_lost_frame_count": cfg.TRACKER_HEADS.get("MAX_LOST_FRAME_COUNT", 0),
            "min_box_rel_dim": cfg.TRACKER_HEADS.get("MIN_BOX_REL_DIM", 0.02),
            "min_instance_period": cfg.TRACKER_HEADS.get("MIN_INSTANCE_PERIOD", 1),
            "track_iou_threshold": cfg.TRACKER_HEADS.get("TRACK_IOU_THRESHOLD", 0.5),
        }

    def update(self, instances: Instances) -> Instances:
        if instances.has("pred_keypoints"):
            raise NotImplementedError("Need to add support for keypoints")
        instances = self._initialize_extra_fields(instances)
        if self._prev_instances is not None:
            iou_all = np.asarray(
                pairwise_iou(instances.pred_boxes, self._prev_instances.pred_boxes)
            )
            bbox_pairs = self._create_prediction_pairs(instances, iou_all)
            self._reset_fields()
            for bbox_pair in bbox_pairs:
                idx = bbox_pair["idx"]
                prev_id = bbox_pair["prev_id"]
                if (
                    idx in self._matched_idx
                    or prev_id in self._matched_ID
                    or bbox_pair["IoU"] < self._track_iou_threshold
                ):
                    continue
                instances.ID[idx] = prev_id
                instances.ID_period[idx] = bbox_pair["prev_period"] + 1
                instances.lost_frame_count[idx] = 0
                self._matched_idx.add(idx)
                self._matched_ID.add(prev_id)
                self._untracked_prev_idx.discard(bbox_pair["prev_idx"])
            instances = self._assign_new_id(instances)
            instances = self._merge_untracked_instances(instances)
        self._prev_instances = copy.deepcopy(instances)
        return instances

    def _create_prediction_pairs(self, instances: Instances, iou_all: np.ndarray) -> List:
        bbox_pairs = []
        for i in range(len(instances)):
            for j in range(len(self._prev_instances)):
                bbox_pairs.append(
                    {
                        "idx": i,
                        "prev_idx": j,
                        "prev_id": self._prev_instances.ID[j],
                        "IoU": iou_all[i, j],
                        "prev_period": self._prev_instances.ID_period[j],
                    }
                )
        bbox_pairs.sort(key=lambda x: -x["IoU"])
        return bbox_pairs

    def _initialize_extra_fields(self, instances: Instances) -> Instances:
        if not instances.has("ID"):
            instances.set("ID", [None] * len(instances))
        if not instances.has("ID_period"):
            instances.set("ID_period", [None] * len(instances))
        if not instances.has("lost_frame_count"):
            instances.set("lost_frame_count", [None] * len(instances))
        if self._prev_instances is None:
            instances.ID = list(range(len(instances)))
            self._id_count += len(instances)
            instances.ID_period = [1] * len(instances)
            instances.lost_frame_count = [0] * len(instances)
        return instances

    def _reset_fields(self):
        self._matched_idx = set()
        self._matched_ID = set()
        self._untracked_prev_idx = set(range(len(self._prev_instances)))

    def _assign_new_id(self, instances: Instances) -> Instances:
        untracked_idx = set(range(len(instances))) - self._matched_idx
        for idx in untracked_idx:
            instances.ID[idx] = self._id_count
            self._id_count += 1
            instances.ID_period[idx] = 1
            instances.lost_frame_count[idx] = 0
        return instances

    def _merge_untracked_instances(self, instances: Instances) -> Instances:
        """Keep recently-lost previous instances alive for up to
        max_lost_frame_count frames."""
        untracked_instances = Instances(
            image_size=instances.image_size,
            pred_boxes=[],
            pred_classes=[],
            scores=[],
            ID=[],
            ID_period=[],
            lost_frame_count=[],
        )
        prev_bboxes = list(np.asarray(self._prev_instances.pred_boxes.tensor))
        prev_classes = list(np.asarray(self._prev_instances.pred_classes))
        prev_scores = list(np.asarray(self._prev_instances.scores))
        prev_ID_period = self._prev_instances.ID_period
        if instances.has("pred_masks"):
            untracked_instances.set("pred_masks", [])
            prev_masks = list(np.asarray(self._prev_instances.pred_masks.tensor)) if self._prev_instances.has("pred_masks") else []
        for idx in self._untracked_prev_idx:
            x_left, y_top, x_right, y_bot = prev_bboxes[idx]
            if (
                (1.0 * (x_right - x_left) / self._video_width < self._min_box_rel_dim)
                or (1.0 * (y_bot - y_top) / self._video_height < self._min_box_rel_dim)
                or self._prev_instances.lost_frame_count[idx] >= self._max_lost_frame_count
                or prev_ID_period[idx] <= self._min_instance_period
            ):
                continue
            untracked_instances.pred_boxes.append(list(prev_bboxes[idx].flatten()))
            untracked_instances.pred_classes.append(int(prev_classes[idx]))
            untracked_instances.scores.append(float(prev_scores[idx]))
            untracked_instances.ID.append(self._prev_instances.ID[idx])
            untracked_instances.ID_period.append(self._prev_instances.ID_period[idx])
            untracked_instances.lost_frame_count.append(self._prev_instances.lost_frame_count[idx] + 1)
            if instances.has("pred_masks"):
                untracked_instances.pred_masks.append(prev_masks[idx])

        out = Instances(instances.image_size)
        out.pred_boxes = Boxes(
            np.concatenate(
                [
                    np.asarray(instances.pred_boxes.tensor).reshape(-1, 4),
                    np.asarray(untracked_instances.pred_boxes, dtype=np.float32).reshape(-1, 4),
                ]
            )
        )
        out.pred_classes = np.concatenate(
            [np.asarray(instances.pred_classes), np.asarray(untracked_instances.pred_classes, dtype=np.int64)]
        )
        out.scores = np.concatenate(
            [np.asarray(instances.scores), np.asarray(untracked_instances.scores, dtype=np.float32)]
        )
        out.ID = list(instances.ID) + untracked_instances.ID
        out.ID_period = list(instances.ID_period) + untracked_instances.ID_period
        out.lost_frame_count = list(instances.lost_frame_count) + untracked_instances.lost_frame_count
        return out
