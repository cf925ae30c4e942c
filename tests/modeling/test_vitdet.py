"""ViT backbone + SimpleFeaturePyramid + CascadeROIHeads smoke tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.modeling.backbone.vit import SimpleFeaturePyramid, ViT


@pytest.fixture(scope="module")
def tiny_vit_sfp():
    vit = ViT(
        img_size=64,
        patch_size=16,
        embed_dim=64,
        depth=2,
        num_heads=2,
        window_size=2,
        window_block_indexes=(0,),
        use_rel_pos=True,
    )
    sfp = SimpleFeaturePyramid(net=vit, out_channels=32)
    return sfp


def test_vit_sfp_shapes(tiny_vit_sfp):
    sfp = tiny_vit_sfp
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = sfp.init(jax.random.PRNGKey(0), x)
    out = sfp.apply(params, x)
    shapes = {k: v.shape for k, v in out.items()}
    assert shapes["p2"] == (1, 16, 16, 32)
    assert shapes["p3"] == (1, 8, 8, 32)
    assert shapes["p4"] == (1, 4, 4, 32)
    assert shapes["p5"] == (1, 2, 2, 32)
    assert shapes["p6"] == (1, 1, 1, 32)
    spec = sfp.output_shape()
    assert spec["p2"].stride == 4 and spec["p6"].stride == 64


def test_vit_windowed_vs_shapes(tiny_vit_sfp):
    # odd input (not divisible by window after patchify) still works via padding
    vit = ViT(img_size=48, patch_size=16, embed_dim=32, depth=1, num_heads=2,
              window_size=2, window_block_indexes=(0,), use_rel_pos=False)
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out["last_feat"].shape == (1, 3, 3, 32)


def test_cascade_roi_heads_e2e():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    B, G = 1, 3
    xy = rng.rand(B, G, 2) * 20
    wh = rng.rand(B, G, 2) * 20 + 4
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (B, G)).astype(np.int32)),
        "gt_valid": jnp.ones((B, G), bool),
        "gt_masks": jnp.asarray((rng.rand(B, G, 28, 28) > 0.5).astype(np.float32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(params, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    # 3 cascade stages x (cls + box) + rpn x2 + mask
    assert any("stage2" in k for k in losses)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(params, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False)
    assert det["pred_boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det["scores"])).all()
