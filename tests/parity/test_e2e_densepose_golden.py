"""End-to-end DensePose chart parity against the reference
(dev/reference_oracle/make_goldens.py::golden_e2e_densepose, reference
projects/DensePose/densepose/modeling/roi_heads/roi_head.py).

Pins, through our .pkl converter: the FPN Decoder (per-level scale heads +
1x1 predictor at stride 4), pooling the densepose branch from the decoder's
single output map, the V1ConvX tower (body_conv_fcn*), and the chart
predictor's four *_lowres stride-2 deconvs + bilinear x2 interp2d."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_densepose_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.densepose import add_densepose_config

    cfg = get_cfg()
    add_densepose_config(cfg)
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
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_densepose_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("densepose e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_densepose.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    model = build_model(cfg)
    # escape hatch: attach raw chart predictor maps alongside detections
    model = model.clone(roi_heads=model.roi_heads.clone(raw_outputs=True))
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

    # --- deterministic pin: the decoder's stride-4 output map
    feat_names = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)

    def decoder_map(mdl, b):
        images = mdl.preprocess_image(b["image"])
        feats = mdl.backbone(images, train=False)
        return mdl.roi_heads.decoder([feats[f] for f in feat_names], train=False)

    dec = np.asarray(model.apply(variables, batch, method=decoder_map))
    ref_dec = g["decoder_map"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    assert dec.shape == ref_dec.shape, (dec.shape, ref_dec.shape)
    assert np.abs(dec - ref_dec).max() < 2e-3, np.abs(dec - ref_dec).max()

    # --- end-to-end detections + raw densepose maps
    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]

    o_order = np.argsort(-scores, kind="stable")
    r_order = np.argsort(-g["out_scores"], kind="stable")
    assert len(o_order) == len(r_order), (len(o_order), len(r_order))
    np.testing.assert_allclose(scores[o_order], g["out_scores"][r_order], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(classes[o_order], g["out_classes"][r_order])
    np.testing.assert_allclose(boxes[o_order], g["out_boxes"][r_order], rtol=1e-3, atol=0.05)

    raw = out["pred_densepose_raw"]
    for ours_key, ref_key in (
        ("coarse_segm", "dp_coarse_segm"),
        ("fine_segm", "dp_fine_segm"),
        ("u", "dp_u"),
        ("v", "dp_v"),
    ):
        ours = np.asarray(raw[ours_key][0])[valid][o_order[:8]]
        ref = g[ref_key][r_order[:8]].transpose(0, 2, 3, 1)  # NCHW -> NHWC
        assert ours.shape == ref.shape, (ours_key, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 5e-3, (ours_key, err)

    # the processed IUV output agrees with the reference maps: part labels
    # from the reference's own argmax match ours except at near-ties
    dp = np.asarray(out["pred_densepose"][0])[valid][o_order[:8]]
    ref_fine = g["dp_fine_segm"][r_order[:8]].transpose(0, 2, 3, 1)
    ref_part = ref_fine.argmax(-1)
    agree = (dp[..., 0] == ref_part) | (dp[..., 0] == 0)
    assert agree.mean() > 0.99, agree.mean()


GOLDEN_DL = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "e2e_densepose_dl_r18.npz"
)


def test_e2e_densepose_deeplab_wc1_reference_weights(tmp_path):
    """The zoo's DL_WC1 family: DensePoseDeepLabHead (GN ASPP at rates
    6/12/56 + GN body tower) with the iid_iso UV-confidence predictor
    (sigma_2_lowres deconv)."""
    if not os.path.exists(GOLDEN_DL):
        pytest.skip("densepose deeplab golden not generated")
    g = np.load(GOLDEN_DL)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_densepose_dl.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseDeepLabHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE = "iid_iso"
    model = build_model(cfg)
    model = model.clone(roi_heads=model.roi_heads.clone(raw_outputs=True))
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

    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]

    o_order = np.argsort(-scores, kind="stable")
    r_order = np.argsort(-g["out_scores"], kind="stable")
    assert len(o_order) == len(r_order), (len(o_order), len(r_order))
    np.testing.assert_allclose(scores[o_order], g["out_scores"][r_order], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(classes[o_order], g["out_classes"][r_order])
    np.testing.assert_allclose(boxes[o_order], g["out_boxes"][r_order], rtol=1e-3, atol=0.05)

    raw = out["pred_densepose_raw"]
    for ours_key, ref_key in (
        ("coarse_segm", "dp_coarse_segm"),
        ("fine_segm", "dp_fine_segm"),
        ("u", "dp_u"),
        ("v", "dp_v"),
        ("sigma_2", "dp_sigma2"),
    ):
        ours = np.asarray(raw[ours_key][0])[valid][o_order[:8]]
        ref = g[ref_key][r_order[:8]].transpose(0, 2, 3, 1)
        assert ours.shape == ref.shape, (ours_key, ours.shape, ref.shape)
        err = np.abs(ours - ref).max()
        assert err < 5e-3, (ours_key, err)
