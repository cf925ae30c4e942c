"""PointSup project tests."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.point_sup import (
    add_point_sup_config,
    get_point_coords_from_point_annotation,
)


def test_point_coords_mapping():
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 50.0]])
    pts = jnp.asarray([[[20.0, 30.0], [5.0, 5.0], [0.0, 0.0]]])  # in, out, pad
    labels = jnp.asarray([[1, 0, -1]])
    coords, lab, w = get_point_coords_from_point_annotation(boxes, pts, labels)
    np.testing.assert_allclose(np.asarray(coords)[0, 0], [0.5, 0.5])
    assert np.asarray(w)[0].tolist() == [1.0, 0.0, 0.0]
    assert np.asarray(lab)[0].tolist() == [1.0, 0.0, 0.0]


def test_point_sup_rcnn_train():
    cfg = get_cfg()
    add_point_sup_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G, P = 4, 5
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    # annotated points inside each gt box
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (1, G)).astype(np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_point_coords": jnp.asarray(pts),
        "gt_point_labels": jnp.asarray(rng.randint(0, 2, (1, G, P)).astype(np.int32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_mask" in losses and np.isfinite(float(losses["loss_mask"]))


def test_implicit_pointrend_point_sup_train():
    """ImplicitPointRendPointSupROIHeads: the implicit head trained from
    annotated points (reference point_sup/mask_head.py:71)."""
    from detectron2_tpu.projects.point_rend import add_pointrend_config

    cfg = get_cfg()
    add_pointrend_config(cfg)
    add_point_sup_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.NAME = "ImplicitPointRendPointSupROIHeads"
    cfg.MODEL.ROI_MASK_HEAD.NAME = "ImplicitPointRendPointSupHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.POINT_HEAD.NAME = "ImplicitPointHead"
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 4
    cfg.MODEL.POINT_HEAD.FC_DIM = 16
    cfg.MODEL.POINT_HEAD.NUM_FC = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 49
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G, P = 4, 5
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (1, G)).astype(np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_point_coords": jnp.asarray(pts),
        "gt_point_labels": jnp.asarray(rng.randint(0, 2, (1, G, P)).astype(np.int32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_mask_point" in losses and np.isfinite(float(losses["loss_mask_point"]))
    assert "loss_l2" in losses and np.isfinite(float(losses["loss_l2"]))

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert det["pred_masks"].shape == (1, 8, 28, 28)
