"""End-to-end Cascade R-CNN parity against the reference — pins the 3-stage
cascade refinement: per-stage cls-agnostic box regression feeding the next
stage, and inference score averaging over the stage heads (reference
modeling/roi_heads/cascade_rcnn.py:167-194)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from .test_e2e_maskrcnn_golden import _our_cfg as _maskrcnn_cfg, synth_weight_value
except ImportError:  # direct-script usage
    from test_e2e_maskrcnn_golden import _our_cfg as _maskrcnn_cfg, synth_weight_value

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_cascadercnn_r18.npz")


def _our_cfg():
    cfg = _maskrcnn_cfg()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 30
    return cfg


def test_e2e_cascade_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("cascade e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_cascade.pkl"
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
    # every reference tensor must map onto one of our params and vice versa —
    # this is what catches silent name-mapping misses (cascade's per-stage
    # heads went unloaded before the box_head_i -> box_head.i rule)
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]

    # set matching with near-tie exemption (see test_e2e_retinanet_golden)
    assert abs(len(scores) - len(g["out_scores"])) <= 1, (len(scores), len(g["out_scores"]))
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
    assert taken.sum() >= 0.8 * len(g["out_scores"]), taken.sum()
