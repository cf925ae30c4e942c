"""TridentNet project tests: weight-shared multi-dilation conv + e2e C4 RCNN."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.tridentnet import TridentConv, add_tridentnet_config


def test_trident_conv_shares_weights():
    conv = TridentConv(features=8, kernel_size=3, dilations=(1, 2, 3))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 4).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), [x, x, x])
    # a single shared kernel parameter
    assert set(variables["params"].keys()) == {"kernel"}
    outs = conv.apply(variables, [x, x, x])
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (1, 16, 16, 8)
    # dilation=1 branch on constant input equals dilation=2 branch away from
    # borders (same weights, same constant receptive sum)
    xc = jnp.ones((1, 16, 16, 4))
    o1, o2, _ = conv.apply(variables, [xc, xc, xc])
    np.testing.assert_allclose(
        np.asarray(o1[0, 8, 8]), np.asarray(o2[0, 8, 8]), rtol=1e-5, atol=1e-5
    )


def test_tridentnet_rcnn_train_and_infer():
    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_trident_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128]]
    cfg.MODEL.RPN.IN_FEATURES = ["res4_b0", "res4_b1", "res4_b2"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G = 4
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (1, G)).astype(np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    # RPN anchors exist per branch level; the trident conv2 kernels are shared
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    for key in ["loss_cls", "loss_box_reg", "loss_rpn_cls", "loss_rpn_loc"]:
        assert key in losses, losses.keys()
        assert np.isfinite(float(losses[key])), key

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert det["pred_boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det["pred_boxes"])).all()
