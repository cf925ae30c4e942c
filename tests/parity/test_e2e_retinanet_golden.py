"""End-to-end RetinaNet parity against the reference — the one-stage
counterpart of test_e2e_maskrcnn_golden.py (same regenerated-weights scheme).
Pins the dense-detector path: RetinaNet head, multi-size/aspect anchors,
sigmoid score decode, top-k candidate selection, per-class NMS."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_retinanet_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 40], [64, 81], [128, 161], [256, 323], [512, 645]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.RETINANET.NUM_CONVS = 2
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.01
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 200
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_retinanet_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("retinanet e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_retinanet.pkl"
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

    # ---- deterministic pin: raw per-level head maps (catches every
    # converter / head-wiring / backbone-numerics bug, with no selection
    # noise). Golden maps are torch NCHW [1, A*K, H, W]; ours are the
    # permute_to_N_HWA_K [1, HWA, K] layout — same H,W,A ordering.
    raw = model.apply(variables, batch, train=False, raw=True)
    levels = ["p3", "p4", "p5", "p6", "p7"]
    for i, f in enumerate(levels):
        for key, ours_l, k in (("logits", raw["logits"], 7), ("deltas", raw["deltas"], 4)):
            ref = g[f"{key}_{f}"]  # [1, A*K, H, W]
            a = ref.shape[1] // k
            ref = ref.transpose(0, 2, 3, 1).reshape(1, -1, a, k).reshape(1, -1, k)
            ours = np.asarray(ours_l[i])
            assert ours.shape == ref.shape, (f, key, ours.shape, ref.shape)
            err = np.abs(ours - ref).max()
            assert err < 2e-3, (f, key, err)

    # ---- end-to-end selection: set matching with a near-tie exemption.
    # Random deep weights leave large clusters of anchors scoring within
    # ~1e-3 of each other; greedy NMS + top-k survivors inside such a
    # cluster are fp-ordering noise, so an unmatched reference detection is
    # forgiven only when one of OUR extra detections ties its score.
    out = model.apply(variables, batch, train=False)
    # the golden's out_* are the reference's POSTPROCESSED instances (boxes
    # clipped to the image); run our production host postprocess to compare
    # in the same frame (decode no longer clips pre-NMS, matching the
    # reference dense_detector.py:206-238)
    from detectron2_tpu.modeling.postprocessing import detector_postprocess

    inst = detector_postprocess(
        {k: np.asarray(v)[0] for k, v in out.items()}, 320, 320, 320, 320
    )
    scores = np.asarray(inst.scores)
    boxes = np.asarray(inst.pred_boxes.tensor)
    classes = np.asarray(inst.pred_classes)
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
    assert taken.sum() >= 40, taken.sum()
