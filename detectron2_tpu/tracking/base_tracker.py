"""Frame-to-frame instance tracking (reference detectron2/tracking/base_tracker.py)."""

import copy
from typing import Dict

from detectron2_tpu.config import CfgNode, configurable
from detectron2_tpu.structures import Instances
from detectron2_tpu.utils.registry import Registry

TRACKER_HEADS_REGISTRY = Registry("TRACKER_HEADS")
"""Registry for tracking classes."""

__all__ = ["TRACKER_HEADS_REGISTRY", "BaseTracker", "build_tracker_head"]


class BaseTracker:
    """A parent class for all trackers: assigns stable IDs to detections
    across video frames."""

    @configurable
    def __init__(self, **kwargs):
        self._prev_instances = None  # (D2)instances for previous frame
        self._matched_idx = set()  # indices in prev_instances found matching
        self._matched_ID = set()  # idendities in prev_instances found matching
        self._untracked_prev_idx = set()  # indices in prev_instances not found matching
        self._id_count = 0  # used to assign new id

    @classmethod
    def from_config(cls, cfg: CfgNode):
        raise NotImplementedError("Calling BaseTracker::from_config")

    def update(self, predictions: Instances) -> Instances:
        """Assign an ID field to each instance in predictions."""
        raise NotImplementedError("Calling BaseTracker::update")


def build_tracker_head(cfg: CfgNode) -> BaseTracker:
    """Build a tracker head from cfg.TRACKER_HEADS.TRACKER_NAME."""
    name = cfg.TRACKER_HEADS.TRACKER_NAME
    tracker_class = TRACKER_HEADS_REGISTRY.get(name)
    return tracker_class(cfg)
