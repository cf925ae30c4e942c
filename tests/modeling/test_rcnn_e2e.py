"""End-to-end Mask R-CNN smoke tests on random inputs (the analogue of
reference tests/modeling/test_model_e2e.py: no data, no weights, train fwd
with losses and eval fwd with empty/degenerate GT)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model


def maskrcnn_cfg(mask_on=True):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.MASK_ON = mask_on
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU tests
    return cfg


def make_batch(B=2, H=64, W=64, G=5, with_gt=True, empty_gt=False, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "image": rng.randint(0, 255, (B, H, W, 3)).astype(np.float32),
        "image_sizes": np.tile(np.array([[H, W]], np.int32), (B, 1)),
    }
    if with_gt:
        xy = rng.rand(B, G, 2) * (W / 2)
        wh = rng.rand(B, G, 2) * (W / 2) + 4
        boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
        valid = np.ones((B, G), bool)
        if empty_gt:
            valid[:] = False
            boxes[:] = 0
        batch.update(
            gt_boxes=boxes,
            gt_classes=rng.randint(0, 8, (B, G)).astype(np.int32),
            gt_valid=valid,
            gt_masks=(rng.rand(B, G, 28, 28) > 0.5).astype(np.float32),
        )
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def model_and_params():
    cfg = maskrcnn_cfg()
    model = build_model(cfg)
    batch = make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    return model, params


def test_train_forward_losses(model_and_params):
    model, params = model_and_params
    batch = make_batch(seed=3)
    losses = model.apply(params, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    expected = {"loss_cls", "loss_box_reg", "loss_mask", "loss_rpn_cls", "loss_rpn_loc"}
    assert set(losses.keys()) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} is not finite"


def test_train_forward_empty_gt(model_and_params):
    """All-padding GT must not produce NaNs (reference test_model_e2e.py:103)."""
    model, params = model_and_params
    batch = make_batch(empty_gt=True, seed=4)
    losses = model.apply(params, batch, train=True, rngs={"sampling": jax.random.PRNGKey(5)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite with empty gt"


def test_grad_flows(model_and_params):
    model, params = model_and_params
    batch = make_batch(seed=6)

    def loss_fn(p):
        losses = model.apply(p, batch, train=True, rngs={"sampling": jax.random.PRNGKey(7)})
        return sum(jax.tree_util.tree_leaves(losses))

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_inference_forward(model_and_params):
    model, params = model_and_params
    batch = make_batch(with_gt=False, seed=8)
    det = model.apply(params, batch, train=False)
    B, D = det["pred_classes"].shape
    assert B == 2 and D == 20
    assert det["pred_boxes"].shape == (2, 20, 4)
    assert det["pred_masks"].shape[0:2] == (2, 20)
    assert det["valid"].dtype == bool
    # scores of valid detections are in (0, 1]
    scores = np.asarray(det["scores"])
    valid = np.asarray(det["valid"])
    assert ((scores[valid] > 0) & (scores[valid] <= 1)).all()


def test_inference_jit(model_and_params):
    model, params = model_and_params
    batch = make_batch(with_gt=False, seed=9)
    f = jax.jit(lambda p, b: model.apply(p, b, train=False))
    det = f(params, batch)
    assert np.isfinite(np.asarray(det["pred_boxes"])).all()


def test_in_graph_mask_paste():
    """TPU.PASTE_MASKS_IN_GRAPH materializes full network-frame masks that
    match the standalone device paste op."""
    from detectron2_tpu.ops.paste_masks import paste_masks_in_image

    cfg = maskrcnn_cfg()
    cfg.TPU.PASTE_MASKS_IN_GRAPH = True
    model = build_model(cfg)
    batch = make_batch(with_gt=False, seed=11)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=False
    )
    det = jax.jit(lambda p, b: model.apply(p, b, train=False))(params, batch)
    assert det["pred_masks_full"].shape == (2, 20, 64, 64)
    assert det["pred_masks_full"].dtype == bool
    want = paste_masks_in_image(det["pred_masks"][0], det["pred_boxes"][0], (64, 64), fast=True)
    np.testing.assert_array_equal(np.asarray(det["pred_masks_full"][0]), np.asarray(want))
    # the fast (bf16-resample) paste may flip bins only on the 0.5 contour
    exact = paste_masks_in_image(det["pred_masks"][0], det["pred_boxes"][0], (64, 64))
    assert (np.asarray(want) != np.asarray(exact)).mean() < 1e-2
