"""End-to-end PanopticFPN parity against the reference — pins the joint
model (shared FPN, instance branch, semseg branch) AND the greedy panoptic
fusion (score-sorted instance paste with overlap threshold, stuff fill with
area limit; reference modeling/meta_arch/panoptic_fpn.py:184-269)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_panoptic_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
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
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.3
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_panoptic_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("panoptic e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_panoptic.pkl"
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

    # --- semseg branch: deterministic logit map
    sem = np.asarray(out["sem_seg"][0])  # [320, 320, 9]
    ref_sem = g["sem_seg"].transpose(1, 2, 0)
    assert np.abs(sem - ref_sem).max() < 2e-3

    # --- instance branch: tie-exempt set matching
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]
    masks28 = np.asarray(out["pred_masks"][0])[valid]
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

    # --- panoptic fusion: run OUR host fusion on our detections and compare
    # the resulting panoptic partition against the reference's
    from detectron2_tpu.modeling.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )
    from detectron2_tpu.ops.paste_masks import paste_masks_in_image
    from detectron2_tpu.structures import BitMasks, Boxes, Instances

    pasted = np.asarray(
        paste_masks_in_image(jnp.asarray(masks28), jnp.asarray(boxes), (320, 320))
    )
    inst = Instances((320, 320))
    inst.pred_masks = BitMasks(pasted.astype(bool))
    inst.scores = scores
    inst.pred_classes = classes
    inst.pred_boxes = Boxes(boxes)
    pan_seg, segments_info = combine_semantic_and_instance_outputs(
        inst,
        sem.argmax(-1),
        overlap_threshold=0.5,
        stuff_area_thresh=4096,
        instances_score_thresh=0.5,
    )

    ref_pan = g["pan_seg"]
    ref_rows = g["seg_rows"]  # [N, 4] id, isthing, category, extra
    # category-level agreement: map each segment id to its category and
    # compare per-pixel category maps (segment ids themselves are
    # order-of-assignment bookkeeping)
    def cat_map(pan, rows):
        m = np.zeros_like(pan) - 1
        for r in rows:
            m[pan == r[0]] = r[2] + (1000 if r[1] else 0)  # separate thing/stuff namespaces
        return m

    our_rows = np.array(
        [
            [s["id"], int(s["isthing"]), s["category_id"], 0]
            for s in segments_info
        ],
        np.int64,
    ).reshape(-1, 4)
    ours_cat = cat_map(pan_seg, our_rows)
    ref_cat = cat_map(ref_pan, ref_rows)
    agree = (ours_cat == ref_cat).mean()
    assert agree > 0.99, agree
    # same number of thing/stuff segments
    assert (our_rows[:, 1] == 1).sum() == (ref_rows[:, 1] == 1).sum()
    assert (our_rows[:, 1] == 0).sum() == (ref_rows[:, 1] == 0).sum()
