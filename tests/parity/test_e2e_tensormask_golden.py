"""TensorMask bipyramid e2e parity against the reference project: reference
weights through our .pkl converter must reproduce the reference's raw head
maps (cls/box/mask towers incl. the bipyramid fuse + swap_align2nat) and its
final detections + native-size mask windows
(reference projects/TensorMask/tensormask/arch.py)."""

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

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens", "e2e_tensormask_r18.npz")


def _our_cfg():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.tensormask import add_tensormask_config

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.FPN.FUSE_TYPE = "avg"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [16, 24], [32, 48], [64, 96], [128, 192], [256, 384], [512, 768]
    ]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 7
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 2
    cfg.MODEL.TENSOR_MASK.CLS_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.MASK_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.ALIGNED_ON = True
    cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON = True
    cfg.MODEL.TENSOR_MASK.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST = 500
    cfg.TEST.DETECTIONS_PER_IMAGE = 25
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_tensormask_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("tensormask e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_tensormask.pkl"
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

    # ---- deterministic pin: raw per-level head maps through backbone + head
    backbone_vars = {k: v["backbone"] for k, v in variables.items() if "backbone" in v}
    imgs = (batch["image"] - jnp.asarray(cfg.MODEL.PIXEL_MEAN)) / jnp.asarray(
        cfg.MODEL.PIXEL_STD
    )
    feats = model.backbone.apply(backbone_vars, imgs, train=False)
    feats_l = [feats[f] for f in model.in_features]
    head_vars = {k: v["head"] for k, v in variables.items() if "head" in v}
    logits_l, deltas_l, masks_l = model.head.apply(head_vars, feats_l, train=False)

    levels = ["p2", "p3", "p4", "p5", "p6", "p7"]
    for i, f in enumerate(levels):
        for key, ours in (("logits", logits_l[i]), ("deltas", deltas_l[i])):
            ref = g[f"{key}_{f}"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
            ours = np.asarray(ours, np.float32)
            assert ours.shape == ref.shape, (f, key, ours.shape, ref.shape)
            err = np.abs(ours - ref).max()
            assert err < 2e-3, (f, key, err)

    # mask maps (incl. swap_align2nat + bipyramid fuse) for the saved levels
    for lvl in (0, 1, 4):
        for anc in range(2):
            ref = g[f"mask_l{lvl}_a{anc}"].transpose(0, 2, 3, 1)
            ours = np.asarray(masks_l[lvl][anc], np.float32)
            assert ours.shape == ref.shape, (lvl, anc, ours.shape, ref.shape)
            err = np.abs(ours - ref).max()
            assert err < 3e-3, (lvl, anc, err)

    # ---- end-to-end detections: set matching with near-tie exemption
    out = model.apply(variables, batch, train=False)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])[valid]
    boxes = np.asarray(out["pred_boxes"][0])[valid]
    classes = np.asarray(out["pred_classes"][0])[valid]
    assert abs(len(scores) - len(g["out_scores"])) <= 1, (len(scores), len(g["out_scores"]))

    taken = np.zeros(len(scores), bool)
    matched_pairs = []  # (ref index, our index)
    unmatched = []
    for ri, (rs, rc, rbx) in enumerate(zip(g["out_scores"], g["out_classes"], g["out_boxes"])):
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
        matched_pairs.append((ri, int(idx[0])))
    extras = scores[~taken]
    hard = [u for u in unmatched if not (len(extras) and np.abs(extras - u[0]).min() < 2e-3)]
    assert not hard, hard
    assert len(matched_pairs) >= 20, len(matched_pairs)

    # ---- mask windows of confidently matched detections: the reference's
    # native-size sigmoid window, resized to our static 28x28 grid with the
    # SAME operator order our inference uses (bilinear on logits -> sigmoid)
    sizes = g["out_mask_sizes"]
    offs = np.concatenate([[0], np.cumsum(sizes**2)])
    our_masks = np.asarray(out["pred_masks"][0])[valid]
    S = our_masks.shape[-1]
    checked = 0
    for ri, oi in matched_pairs:
        m = sizes[ri]
        win = g["out_mask_windows"][offs[ri] : offs[ri + 1]].reshape(m, m)
        logit = np.log(win) - np.log1p(-win)  # invert the reference sigmoid
        exp = jax.nn.sigmoid(
            jax.image.resize(jnp.asarray(logit), (S, S), method="bilinear")
        )
        err = np.abs(np.asarray(exp) - our_masks[oi]).max()
        assert err < 5e-3, (ri, oi, m, err)
        checked += 1
    assert checked >= 20, checked
