"""End-to-end Mask R-CNN C4 parity against the reference — pins the C4 path:
bare ResNet backbone (res4), single-level pooler, Res5ROIHeads shared res5
feature extractor for box + mask, and the C4 deconv mask head (reference
modeling/roi_heads/roi_heads.py:341-526)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_maskrcnn_c4_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 300
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 0
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.MASK_ON = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 30
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_c4_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("c4 e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_c4.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.asarray(g["image"][None].astype(np.float32)),
        "image_sizes": jnp.asarray([[320, 320]], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=False
    )
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]

    # set matching with near-tie exemption (see test_e2e_retinanet_golden);
    # masks are compared per matched pair against the reference's top-10
    masks = np.asarray(out["pred_masks"][0])[valid] if "pred_masks" in out else None
    assert abs(len(scores) - len(g["out_scores"])) <= 1, (len(scores), len(g["out_scores"]))
    r_order = np.argsort(-g["out_scores"], kind="stable")
    taken = np.zeros(len(scores), bool)
    unmatched = []
    for rank, ri in enumerate(r_order):
        rs, rc, rbx = g["out_scores"][ri], g["out_classes"][ri], g["out_boxes"][ri]
        cand = (
            (classes == rc)
            & ~taken
            & (np.abs(scores - rs) < 1e-3 * abs(rs) + 1e-4)
            & (np.abs(boxes - rbx).max(axis=1) < 0.05)
        )
        idx = np.where(cand)[0]
        if len(idx) == 0:
            unmatched.append((rs, rc, rbx))
            continue
        taken[idx[0]] = True
        # mask_probs10 is saved for the reference's first 10 detections
        # (d2 outputs score-sorted, so golden index == detection rank)
        if masks is not None and "mask_probs10" in g and ri < g["mask_probs10"].shape[0]:
            np.testing.assert_allclose(masks[idx[0]], g["mask_probs10"][ri], atol=3e-4)
    extras = scores[~taken]
    hard = [u for u in unmatched if not (len(extras) and np.abs(extras - u[0]).min() < 2e-3)]
    assert not hard, hard
    assert taken.sum() >= 0.8 * len(g["out_scores"]), taken.sum()
