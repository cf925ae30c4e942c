"""Tracker tests (analogue of reference tests/tracking/*): ID propagation
through consecutive frames for the IoU and the two Hungarian trackers."""

import copy

import numpy as np
import pytest

from detectron2_tpu.config import CfgNode, get_cfg
from detectron2_tpu.structures import Boxes, Instances
from detectron2_tpu.tracking import (
    BBoxIOUTracker,
    IOUWeightedHungarianBBoxIOUTracker,
    VanillaHungarianBBoxIOUTracker,
    build_tracker_head,
    create_prediction_pairs,
)


def _instances(boxes, scores, classes, img_size=(600, 800)):
    inst = Instances(img_size)
    inst.pred_boxes = Boxes(np.asarray(boxes, np.float32))
    inst.scores = np.asarray(scores, np.float32)
    inst.pred_classes = np.asarray(classes, np.int64)
    return inst


PREV = [[101, 101, 200, 200], [301, 301, 450, 450]]
CURR = [[302, 303, 451, 452], [101, 102, 201, 203]]  # swapped order, near-identical boxes


def _tracker_cfg(name):
    cfg = get_cfg()
    cfg.TRACKER_HEADS = CfgNode(
        dict(
            TRACKER_NAME=name,
            VIDEO_HEIGHT=600,
            VIDEO_WIDTH=800,
            MAX_NUM_INSTANCES=200,
            MAX_LOST_FRAME_COUNT=0,
            MIN_BOX_REL_DIM=0.02,
            MIN_INSTANCE_PERIOD=1,
            TRACK_IOU_THRESHOLD=0.5,
        )
    )
    return cfg


@pytest.mark.parametrize(
    "name",
    ["BBoxIOUTracker", "VanillaHungarianBBoxIOUTracker", "IOUWeightedHungarianBBoxIOUTracker"],
)
def test_id_propagation_across_frames(name):
    tracker = build_tracker_head(_tracker_cfg(name))
    prev = tracker.update(_instances(PREV, [0.9, 0.9], [1, 1]))
    prev_ids = list(prev.ID)
    curr = tracker.update(_instances(CURR, [0.95, 0.85], [1, 1]))
    # current box 0 overlaps previous box 1 and vice versa
    assert curr.ID[0] == prev_ids[1]
    assert curr.ID[1] == prev_ids[0]
    assert all(p == 2 for p in curr.ID_period)


@pytest.mark.parametrize(
    "name",
    ["BBoxIOUTracker", "VanillaHungarianBBoxIOUTracker", "IOUWeightedHungarianBBoxIOUTracker"],
)
def test_new_object_gets_new_id(name):
    tracker = build_tracker_head(_tracker_cfg(name))
    prev = tracker.update(_instances(PREV, [0.9, 0.9], [1, 1]))
    curr_boxes = CURR + [[500, 500, 580, 580]]  # one brand-new object
    curr = tracker.update(_instances(curr_boxes, [0.95, 0.85, 0.7], [1, 1, 2]))
    assert curr.ID[2] not in set(prev.ID)


def test_create_prediction_pairs():
    from detectron2_tpu.structures.boxes import pairwise_iou

    prev = _instances(PREV, [0.9, 0.9], [1, 1])
    prev.ID = [0, 1]
    prev.ID_period = [1, 1]
    curr = _instances(CURR, [0.95, 0.85], [1, 1])
    iou_all = np.asarray(pairwise_iou(curr.pred_boxes, prev.pred_boxes))
    pairs = create_prediction_pairs(curr, prev, iou_all, threshold=0.5)
    assert len(pairs) == 2
    assert {(p["idx"], p["prev_idx"]) for p in pairs} == {(0, 1), (1, 0)}
    assert all(p["IoU"] >= 0.5 for p in pairs)


def test_vanilla_vs_weighted_cost_matrices():
    prev = _instances(PREV, [0.9, 0.9], [1, 1])
    curr = _instances(CURR, [0.95, 0.85], [1, 1])
    v = VanillaHungarianBBoxIOUTracker(
        video_height=600, video_width=800, max_num_instances=200,
        max_lost_frame_count=0, min_box_rel_dim=0.02, min_instance_period=1,
        track_iou_threshold=0.5,
    )
    w = IOUWeightedHungarianBBoxIOUTracker(
        video_height=600, video_width=800, max_num_instances=200,
        max_lost_frame_count=0, min_box_rel_dim=0.02, min_instance_period=1,
        track_iou_threshold=0.5,
    )
    prev = v._initialize_extra_fields(copy.deepcopy(prev))
    v._prev_instances = prev
    w._prev_instances = prev
    cm_v = v.build_cost_matrix(copy.deepcopy(curr), prev)
    cm_w = w.build_cost_matrix(copy.deepcopy(curr), prev)
    # vanilla: exactly -1 on matched pairs; weighted: -IoU in (-1, 0)
    assert cm_v[0, 1] == -1 and cm_v[1, 0] == -1
    assert -1 < cm_w[0, 1] < -0.5 and -1 < cm_w[1, 0] < -0.5
    assert cm_v[0, 0] == 0 and cm_w[0, 0] == 0
