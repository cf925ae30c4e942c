"""TridentNet-Fast e2e parity against the reference project: reference R50
trident weights through our .pkl converter must reproduce the reference's
res4 feature map, proposals, and detections. Pins the weight-shared
multi-dilation TridentConv (fast test path = middle branch, dilation 2),
TridentRPN's single-branch test behavior, and the shared-res5 C4 box head
(reference projects/TridentNet/tridentnet/)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_tridentnet_r50.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.tridentnet import add_tridentnet_config

    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_trident_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "TridentRPN"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    # the training design runs the RPN over all branch levels; TridentRPN
    # restricts inference to the aliased "res4" (= middle branch), which is
    # what this golden exercises
    cfg.MODEL.RPN.IN_FEATURES = ["res4_b0", "res4_b1", "res4_b2"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 300
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.TRIDENT.NUM_BRANCH = 3
    cfg.MODEL.TRIDENT.BRANCH_DILATIONS = [1, 2, 3]
    cfg.MODEL.TRIDENT.TEST_BRANCH_IDX = 1
    cfg.MODEL.MASK_ON = False
    cfg.TEST.DETECTIONS_PER_IMAGE = 30
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_tridentnet_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("tridentnet e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_trident.pkl"
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
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    # backbone feature parity first (fast bisection signal)
    backbone = model.backbone
    feats = backbone.apply(
        {k: v["backbone"] for k, v in variables.items() if "backbone" in v},
        (batch["image"] - jnp.asarray(cfg.MODEL.PIXEL_MEAN)) / jnp.asarray(cfg.MODEL.PIXEL_STD),
        train=False,
    )
    ref_res4 = g["feat_res4"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats["res4"]), ref_res4, atol=2e-3)

    out = model.apply(variables, batch, train=False)

    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]
    assert len(scores) == len(g["out_scores"]), (len(scores), len(g["out_scores"]))

    # set matching with a near-tie exemption: the random-weight fixture
    # leaves clusters of detections scoring within ~1e-6, whose sorted order
    # is fp noise (verified: all raw mismatches are adjacent-pair swaps at
    # equal scores)
    taken = np.zeros(len(scores), bool)
    unmatched = []
    for rs, rc, rbx in zip(g["out_scores"], g["out_classes"], g["out_boxes"]):
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
    extras = scores[~taken]
    hard = [u for u in unmatched if not (len(extras) and np.abs(extras - u[0]).min() < 2e-3)]
    assert not hard, hard
    assert taken.sum() >= 25, taken.sum()
