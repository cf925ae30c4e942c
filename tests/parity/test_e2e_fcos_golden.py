"""End-to-end FCOS parity against the reference — the anchor-free one-stage
path: point anchors, linear stride-normalized box transform, centerness
scoring sqrt(cls*ctr), GN dense heads (reference modeling/meta_arch/fcos.py).
Deterministic pin: raw per-level head maps; final detections use tie-exempt
set matching like the other dense-detector goldens."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_fcos_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FCOS"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.RETINANET.NUM_CONVS = 2
    cfg.TEST.DETECTIONS_PER_IMAGE = 100
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_fcos_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("fcos e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_fcos.pkl"
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
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params
    assert "Unused checkpoint keys" not in ckpt.last_report, ckpt.last_report
    assert "Randomly initialized" not in ckpt.last_report, ckpt.last_report

    # ---- deterministic pin: raw head maps (our head relu's the deltas; the
    # reference's relu lives inside Box2BoxTransformLinear.apply_deltas, so
    # compare ours against relu(reference))
    raw = model.apply(variables, batch, train=False, raw=True)
    levels = ["p3", "p4", "p5", "p6", "p7"]
    for i, f in enumerate(levels):
        for key, ours_l, k, post in (
            ("logits", raw["logits"], 7, lambda a: a),
            ("deltas", raw["deltas"], 4, lambda a: np.maximum(a, 0.0)),
            ("ctrness", raw["ctrness"], 1, lambda a: a),
        ):
            ref = post(g[f"{key}_{f}"])  # [1, K, H, W]
            ref = ref.transpose(0, 2, 3, 1).reshape(1, -1, k)
            ours = np.asarray(ours_l[i])
            assert ours.shape == ref.shape, (f, key, ours.shape, ref.shape)
            err = np.abs(ours - ref).max()
            assert err < 2e-3, (f, key, err)

    # ---- end-to-end selection with near-tie exemption. The golden passed
    # through the reference's detector_postprocess, which drops empty boxes
    # after clipping; apply the same filter to our network-frame output (our
    # host detector_postprocess does it too — FCOS's relu'd linear deltas
    # routinely produce zero-extent boxes under synthetic weights).
    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]
    nonempty = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    scores, boxes, classes = scores[nonempty], boxes[nonempty], classes[nonempty]
    assert abs(len(scores) - len(g["out_scores"])) <= 3, (len(scores), len(g["out_scores"]))
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
