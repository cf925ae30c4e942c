"""DensePose chart-head project tests."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.densepose import add_densepose_config


def _cfg():
    cfg = get_cfg()
    add_densepose_config(cfg)
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
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1  # person
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_densepose_rcnn_train_and_infer():
    model = build_model(_cfg())

    rng = np.random.RandomState(0)
    G, P = 3, 10
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    part = rng.randint(0, 24, (1, G, P)).astype(np.int32)
    part[0, :, -2:] = -1  # padded point slots
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(np.zeros((1, G), np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_dp_points": jnp.asarray(pts),
        "gt_dp_part": jnp.asarray(part),
        "gt_dp_u": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
        "gt_dp_v": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ["loss_densepose_I", "loss_densepose_S", "loss_densepose_U", "loss_densepose_V"]:
        assert k in losses, losses.keys()
        assert np.isfinite(float(losses[k])), k

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert det["pred_densepose"].shape == (1, 8, 28, 28, 3)
    dp = np.asarray(det["pred_densepose"])
    assert np.isfinite(dp).all()
    assert (dp[..., 1:] >= 0).all() and (dp[..., 1:] <= 1).all()
