"""FastRCNNOutputLayers loss parity, pinned to the reference's exact expected
values (reference tests/modeling/test_fast_rcnn.py:17-46 expects
loss_cls=1.7951188087, loss_box_reg=4.0357131958 from torch.manual_seed(132)).

torch (cpu) is available here, so the test reproduces the reference's exact
RNG sequence — nn.Linear construction + init overrides + torch.rand features —
and feeds the identical predictions into our loss. Passing means our CE/
smooth-l1 formulation, delta encoding, and normalizers match the reference
bit-for-bit, not just structurally.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from detectron2_tpu.modeling.roi_heads.fast_rcnn import FastRCNNOutputLayers  # noqa: E402


def _reference_inputs(seed=132, in_dim=8, num_classes=5, box_dim=4):
    """Replicate the reference test's RNG sequence exactly."""
    torch.manual_seed(seed)
    cls_score = torch.nn.Linear(in_dim, num_classes + 1)
    bbox_pred = torch.nn.Linear(in_dim, num_classes * box_dim)
    torch.nn.init.normal_(cls_score.weight, std=0.01)
    torch.nn.init.normal_(bbox_pred.weight, std=0.001)
    for l in [cls_score, bbox_pred]:
        torch.nn.init.constant_(l.bias, 0)
    feature_pooled = torch.rand(2, in_dim)
    with torch.no_grad():
        scores = cls_score(feature_pooled)
        deltas = bbox_pred(feature_pooled)
    return scores.numpy(), deltas.numpy()


def test_fast_rcnn_exact_losses():
    scores, deltas = _reference_inputs()

    predictor = FastRCNNOutputLayers(
        num_classes=5,
        box2box_weights=(10.0, 10.0, 5.0, 5.0),
        smooth_l1_beta=0.0,
        box_reg_loss_type="smooth_l1",
    )
    proposal_boxes = np.array([[0.8, 1.1, 3.2, 2.8], [2.3, 2.5, 7, 8]], np.float32)
    gt_boxes = np.array([[1, 1, 3, 3], [2, 2, 6, 6]], np.float32)
    gt_classes = np.array([1, 2], np.int32)

    losses = predictor.losses((scores, deltas), proposal_boxes, gt_boxes, gt_classes)

    # reference tests/modeling/test_fast_rcnn.py:40-44
    np.testing.assert_allclose(float(losses["loss_cls"]), 1.7951188087, rtol=1e-5)
    np.testing.assert_allclose(float(losses["loss_box_reg"]), 4.0357131958, rtol=1e-5)


def test_fast_rcnn_all_padding_zero_losses():
    """All-padding (gt_class = -1) slots must yield exactly zero losses — the
    analogue of the reference's empty-batch test (test_fast_rcnn.py:47-60)."""
    scores, deltas = _reference_inputs()
    predictor = FastRCNNOutputLayers(num_classes=5)
    proposal_boxes = np.zeros((2, 4), np.float32)
    gt_boxes = np.zeros((2, 4), np.float32)
    gt_classes = np.array([-1, -1], np.int32)
    losses = predictor.losses((scores, deltas), proposal_boxes, gt_boxes, gt_classes)
    assert float(losses["loss_cls"]) == 0.0
    assert float(losses["loss_box_reg"]) == 0.0
