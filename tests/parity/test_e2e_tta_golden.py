"""TTA parity against the reference (dev/reference_oracle/make_goldens.py::
golden_e2e_tta, reference modeling/test_time_augmentation.py:101-307):
our GeneralizedRCNNWithTTA must reproduce the reference TTA's final merged
detections and averaged+pasted masks on the Mask R-CNN R18 fixture —
multi-scale (256, 320) x flip, PIL-resized copies, inverse-transform box
union, one-hot fast_rcnn merge NMS, per-frame mask re-run + averaging."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from .test_e2e_maskrcnn_golden import _our_cfg, synth_weight_value
except ImportError:  # direct-script usage
    from test_e2e_maskrcnn_golden import _our_cfg, synth_weight_value

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_tta_r18.npz")


def test_e2e_tta_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("tta golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_tta.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.modeling.test_time_augmentation import GeneralizedRCNNWithTTA

    cfg = _our_cfg()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (256, 320)
    cfg.TEST.AUG.MAX_SIZE = 512
    cfg.TEST.AUG.FLIP = True

    model = build_model(cfg)
    batch = {
        "image": jnp.zeros((1, 320, 320, 3), jnp.float32),
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

    tta = GeneralizedRCNNWithTTA(cfg, model, variables)
    out = tta([{"image": g["image"], "height": 320, "width": 320}])[0]["instances"]

    boxes = np.asarray(out.pred_boxes.tensor)
    scores = np.asarray(out.scores)
    classes = np.asarray(out.pred_classes)

    # tie-exempt set matching (same protocol as the retinanet golden): the
    # union of augmented copies contains many near-duplicate boxes whose NMS
    # survivor among a tie cluster is fp-ordering noise
    taken = np.zeros(len(scores), bool)
    unmatched = []
    for rs, rc, rbx in zip(g["out_scores"], g["out_classes"], g["out_boxes"]):
        cand = (
            (classes == rc)
            & ~taken
            & (np.abs(scores - rs) < 1e-3 * abs(rs) + 1e-4)
            & (np.abs(boxes - rbx).max(axis=1) < 0.1)
        )
        idx = np.where(cand)[0]
        if len(idx) == 0:
            unmatched.append((float(rs), int(rc), rbx))
            continue
        taken[idx[0]] = True
    extras = scores[~taken]
    hard = [u for u in unmatched if not (len(extras) and np.abs(extras - u[0]).min() < 2e-3)]
    assert not hard, hard[:5]
    assert taken.sum() >= 0.9 * len(g["out_scores"]), (taken.sum(), len(g["out_scores"]))

    # averaged + pasted masks: IoU vs the reference for the top matched
    # detections (mask probs hover near the paste threshold with random
    # weights, so bound the thresholding artifact rather than require
    # bit-equality)
    if out.has("pred_masks") and g["out_masks10"].size:
        ref_order = np.argsort(-g["out_scores"], kind="stable")[:10]
        our_masks = np.asarray(out.pred_masks.tensor if hasattr(out.pred_masks, "tensor") else out.pred_masks)
        matched = 0
        for ri in ref_order:
            rs, rc, rbx = g["out_scores"][ri], g["out_classes"][ri], g["out_boxes"][ri]
            cand = np.where(
                (classes == rc)
                & (np.abs(scores - rs) < 1e-3 * abs(rs) + 1e-4)
                & (np.abs(boxes - rbx).max(axis=1) < 0.1)
            )[0]
            if len(cand) == 0:
                continue
            ref_mask = g["out_masks10"][list(ref_order).index(ri)].astype(bool)
            ours_mask = our_masks[cand[0]].astype(bool)
            inter = (ref_mask & ours_mask).sum()
            union = (ref_mask | ours_mask).sum()
            if union:
                assert inter / union > 0.85, (ri, inter / union)
            matched += 1
        assert matched >= 7, matched
