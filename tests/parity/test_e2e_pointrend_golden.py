"""PointRend e2e parity against the reference project: reference weights
through our .pkl converter must reproduce the reference's detections and
refined masks. Pins the point-sampled coarse pooling (ConvFCHead incl. the
optional reduce_channel_dim_conv), the Conv1d->Dense point head conversion,
and the subdivision inference loop with the init-resolution doubling
shortcut (reference projects/PointRend/point_rend/mask_head.py:302-360)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from .test_e2e_maskrcnn_golden import synth_weight_value
except ImportError:  # direct-script usage
    from test_e2e_maskrcnn_golden import synth_weight_value

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_pointrend_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.point_rend import add_pointrend_config

    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.NAME = "PointRendROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_MASK_HEAD.NAME = "CoarseMaskHead"
    cfg.MODEL.ROI_MASK_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 7
    cfg.MODEL.POINT_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.POINT_HEAD.FC_DIM = 32
    cfg.MODEL.POINT_HEAD.NUM_FC = 3
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 3
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 196
    cfg.MODEL.MASK_ON = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_pointrend_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("pointrend e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_pointrend.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    model = build_model(cfg)
    # the subdivision shortcut must fold 7x7 + 3 steps into 14x14 + 2 steps
    heads = model.roi_heads
    assert heads.subdivision_init_resolution == 14 and heads.subdivision_steps == 2

    batch = {
        "image": jnp.asarray(g["image"][None].astype(np.float32)),
        "image_sizes": jnp.asarray([[320, 320]], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    out = model.apply(variables, batch, train=False)

    valid = np.asarray(out["valid"][0])
    ours = {
        "boxes": np.asarray(out["pred_boxes"][0])[valid],
        "scores": np.asarray(out["scores"][0])[valid],
        "classes": np.asarray(out["pred_classes"][0])[valid],
        "masks": np.asarray(out["pred_masks"][0])[valid],
    }
    o_order = np.argsort(-ours["scores"], kind="stable")
    r_order = np.argsort(-g["out_scores"], kind="stable")
    assert len(o_order) == len(r_order), (len(o_order), len(r_order))

    np.testing.assert_allclose(
        ours["scores"][o_order], g["out_scores"][r_order], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(ours["classes"][o_order], g["out_classes"][r_order])
    np.testing.assert_allclose(
        ours["boxes"][o_order], g["out_boxes"][r_order], rtol=1e-3, atol=0.05
    )

    # top-10 refined 56x56 mask probabilities from the subdivision loop
    assert ours["masks"].shape[-1] == 56
    np.testing.assert_allclose(
        ours["masks"][o_order[:10]], g["mask_probs10"][r_order[:10]], atol=5e-4
    )
