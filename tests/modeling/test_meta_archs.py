"""e2e smoke tests for the non-RCNN meta-architectures + keypoint branch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model


def base_cfg():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def make_batch(B=1, H=64, W=64, G=4, C=4, sem=False, kpts=0, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, G, 2) * (W / 2)
    wh = rng.rand(B, G, 2) * (W / 3) + 6
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[H, W]] * B, jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, C, (B, G)).astype(np.int32)),
        "gt_valid": jnp.ones((B, G), bool),
    }
    if sem:
        batch["gt_sem_seg"] = jnp.asarray(rng.randint(0, 5, (B, H, W)).astype(np.int32))
    if kpts:
        k = rng.rand(B, G, kpts, 3).astype(np.float32)
        k[..., 0] = k[..., 0] * 10 + np.asarray(batch["gt_boxes"])[..., 0:1]
        k[..., 1] = k[..., 1] * 10 + np.asarray(batch["gt_boxes"])[..., 1:2]
        k[..., 2] = 2
        batch["gt_keypoints"] = jnp.asarray(k)
        batch["gt_masks"] = jnp.asarray((rng.rand(B, G, 28, 28) > 0.5).astype(np.float32))
    return batch


def _init(model, batch, train=True):
    return model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=train
    )


def test_retinanet_train_and_infer():
    cfg = base_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 4
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 40], [64, 80], [128, 160], [256, 320], [512, 640]]
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    model = build_model(cfg)
    batch = make_batch()

    variables = _init(model, batch)
    losses, new_vars = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}, mutable=["meters"]
    )
    assert set(losses.keys()) == {"loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert det["pred_boxes"].shape == (1, 10, 4)
    assert np.isfinite(np.asarray(det["pred_boxes"])).all()


def test_fcos_train_and_infer():
    cfg = base_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FCOS"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 4
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.TEST.DETECTIONS_PER_IMAGE = 10

    from detectron2_tpu.modeling.meta_arch.fcos import FCOS

    model = FCOS.from_config(cfg)
    batch = make_batch()
    variables = _init(model, batch)
    losses, _ = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}, mutable=["meters"]
    )
    assert set(losses.keys()) == {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert det["pred_boxes"].shape == (1, 10, 4)


def test_semantic_segmentor():
    cfg = base_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    model = build_model(cfg)
    batch = make_batch(sem=True)
    variables = _init(model, batch)
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_sem_seg" in losses and np.isfinite(float(losses["loss_sem_seg"]))

    out = model.apply(variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert out["sem_seg"].shape == (1, 64, 64, 5)


def test_panoptic_fpn():
    cfg = base_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    model = build_model(cfg)
    batch = make_batch(sem=True)
    batch["gt_masks"] = jnp.asarray(
        (np.random.RandomState(0).rand(1, 4, 28, 28) > 0.5).astype(np.float32)
    )
    variables = _init(model, batch)
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    for key in ["loss_sem_seg", "loss_cls", "loss_mask", "loss_rpn_cls"]:
        assert key in losses, losses.keys()
        assert np.isfinite(float(losses[key])), key

    det = model.apply(variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert "sem_seg" in det and "pred_masks" in det


def test_keypoint_rcnn_branch():
    cfg = base_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (64, 64)
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 17
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    model = build_model(cfg)
    batch = make_batch(C=1, kpts=17)
    variables = _init(model, batch)
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_keypoint" in losses and np.isfinite(float(losses["loss_keypoint"]))

    det = model.apply(variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert det["pred_keypoints"].shape == (1, 8, 17, 4)
    assert np.isfinite(np.asarray(det["pred_keypoints"])).all()
