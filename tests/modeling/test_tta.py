"""GeneralizedRCNNWithTTA tests: the full reference protocol — box union via
fast_rcnn-style merge, mask-head re-run on merged boxes in every augmented
frame, flip-and-average mask reduction (reference
modeling/test_time_augmentation.py:101-307)."""

import numpy as np
import pytest

import jax

from detectron2_tpu.modeling import build_model
from detectron2_tpu.modeling.test_time_augmentation import (
    DatasetMapperTTA,
    GeneralizedRCNNWithTTA,
)

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_rcnn_e2e import make_batch, maskrcnn_cfg  # noqa: E402


@pytest.fixture(scope="module")
def tta_setup():
    cfg = maskrcnn_cfg()
    cfg.TEST.AUG.MIN_SIZES = (64, 96)
    cfg.TEST.AUG.MAX_SIZE = 200
    cfg.TEST.AUG.FLIP = True
    cfg.TPU.SIZE_BUCKET = 32
    # random weights produce near-uniform scores; keep every slot so the
    # given-boxes mask path is actually exercised
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    model = build_model(cfg)
    batch = make_batch(B=1, H=64, W=64)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    return cfg, model, params


def test_tta_mapper_produces_scale_x_flip(tta_setup):
    cfg, model, params = tta_setup
    mapper = DatasetMapperTTA.from_config(cfg)
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3)).astype(np.uint8)
    dics = mapper({"image": img, "height": 64, "width": 64})
    assert len(dics) == 4  # 2 scales x {id, flip}
    assert all("transforms" in d for d in dics)


def test_tta_end_to_end_with_masks(tta_setup):
    cfg, model, params = tta_setup
    tta = GeneralizedRCNNWithTTA(cfg, model, params)
    img = np.random.RandomState(1).randint(0, 255, (64, 64, 3)).astype(np.uint8)
    out = tta([{"image": img, "height": 64, "width": 64}])[0]
    inst = out["instances"]
    assert inst.image_size == (64, 64)
    n = len(inst)
    assert inst.pred_boxes.tensor.shape == (n, 4)
    if n:
        # the mask branch must have produced full-resolution pasted masks
        assert inst.pred_masks.tensor.shape == (n, 64, 64)
        assert inst.pred_masks.tensor.dtype == bool
    # all boxes inside the original frame
    b = np.asarray(inst.pred_boxes.tensor)
    assert (b >= -1e-3).all() and (b[:, 0::2] <= 64 + 1e-3).all()


def test_given_boxes_path_matches_mask_head(tta_setup):
    """The `given_boxes` device path must produce the same 28x28 masks as the
    normal inference cascade does for its own detected boxes."""
    import jax.numpy as jnp

    cfg, model, params = tta_setup
    batch = make_batch(B=1, H=64, W=64, with_gt=False, seed=9)
    det = model.apply(params, batch, train=False)
    valid = np.asarray(det["valid"][0])
    if not valid.any():
        pytest.skip("random model produced no detections")
    given = dict(batch)
    given["given_boxes"] = det["pred_boxes"]
    given["given_classes"] = det["pred_classes"].astype(jnp.int32)
    given["given_valid"] = det["valid"]
    out = model.apply(params, given, train=False)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"][0][valid]),
        np.asarray(det["pred_masks"][0][valid]),
        rtol=2e-3,
        atol=2e-3,
    )
