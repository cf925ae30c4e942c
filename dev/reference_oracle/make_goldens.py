#!/usr/bin/env python
"""Generate golden parity fixtures from the reference detectron2 (CPU torch),
vendored into tests/goldens/*.npz and consumed by tests/parity/.

Run on a box that has /root/reference mounted:
    python dev/reference_oracle/make_goldens.py

The reference runs under dev/reference_oracle/stubs.py shims (see that file
for what is shimmed and why the shims are numerically trustworthy). Each
golden bundles the exact inputs AND the reference outputs, so the tests do
not depend on /root/reference or torch RNG at test time.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, HERE)
import stubs  # noqa: E402

stubs.install()
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def save(name, **arrays):
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, name + ".npz"), **arrays)
    print(f"wrote {name}.npz: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


def t2n(x):
    return x.detach().cpu().numpy()


# ------------------------------------------------------------------ RPN seed-121


def golden_rpn():
    """The reference tests/modeling/test_rpn.py::test_rpn scenario: seed 121,
    default C4 config, 2 images, res4 features 1x2. Captures the initialized
    RPN-head weights + inputs + reference losses/proposals."""
    from detectron2.config import get_cfg
    from detectron2.modeling.backbone import build_backbone
    from detectron2.modeling.proposal_generator import RPN
    from detectron2.structures import Boxes, ImageList, Instances
    from detectron2.utils.events import EventStorage

    torch.manual_seed(121)
    cfg = get_cfg()
    # the reference's test_rpn_larger_num_convs variant (5x 64-ch head convs,
    # published literals loss_rpn_cls=0.08122821152 loss_rpn_loc=0.10064548254)
    # — chosen over the default 1024-ch head to keep the vendored golden ~3MB
    cfg.MODEL.RPN.CONV_DIMS = [64, 64, 64, 64, 64]
    backbone = build_backbone(cfg)
    rpn = RPN(cfg, backbone.output_shape())

    num_images = 2
    images_tensor = torch.rand(num_images, 20, 30)
    image_sizes = [(10, 10), (20, 30)]
    images = ImageList(images_tensor, image_sizes)
    features = {"res4": torch.rand(num_images, 1024, 1, 2)}
    gt_boxes = torch.tensor([[1, 1, 3, 3], [2, 2, 6, 6]], dtype=torch.float32)
    gt0 = Instances((10, 10))
    gt0.gt_boxes = Boxes(gt_boxes[:1])
    gt1 = Instances((20, 30))
    gt1.gt_boxes = Boxes(gt_boxes[1:])

    with EventStorage():
        proposals, losses = rpn(images, features, [gt0, gt1])

    sd = rpn.rpn_head.state_dict()
    convs = {}
    for i in range(len(cfg.MODEL.RPN.CONV_DIMS)):
        convs[f"conv{i}_w"] = t2n(sd[f"conv.conv{i}.weight"])
        convs[f"conv{i}_b"] = t2n(sd[f"conv.conv{i}.bias"])
    save(
        "rpn_seed121",
        **convs,
        obj_w=t2n(sd["objectness_logits.weight"]),
        obj_b=t2n(sd["objectness_logits.bias"]),
        del_w=t2n(sd["anchor_deltas.weight"]),
        del_b=t2n(sd["anchor_deltas.bias"]),
        features=t2n(features["res4"]),
        gt_boxes=t2n(gt_boxes),
        image_sizes=np.array(image_sizes, np.int32),
        loss_rpn_cls=np.array(float(losses["loss_rpn_cls"])),
        loss_rpn_loc=np.array(float(losses["loss_rpn_loc"])),
        prop0_boxes=t2n(proposals[0].proposal_boxes.tensor),
        prop0_logits=t2n(proposals[0].objectness_logits),
        prop1_boxes=t2n(proposals[1].proposal_boxes.tensor),
        prop1_logits=t2n(proposals[1].objectness_logits),
    )


# ------------------------------------------------------------------ paste_masks


def golden_paste_masks():
    from detectron2.layers.mask_ops import paste_masks_in_image
    from detectron2.structures import Boxes

    rng = np.random.RandomState(3)
    N, M = 12, 28
    H, W = 97, 131
    masks = rng.rand(N, M, M).astype(np.float32)
    x1 = rng.rand(N) * (W - 30)
    y1 = rng.rand(N) * (H - 30)
    bw = rng.rand(N) * 60 + 4
    bh = rng.rand(N) * 60 + 4
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, W + 5), np.minimum(y1 + bh, H + 5)], 1).astype(
        np.float32
    )
    out = paste_masks_in_image(
        torch.from_numpy(masks), Boxes(torch.from_numpy(boxes)), (H, W), threshold=0.5
    )
    raw = paste_masks_in_image(
        torch.from_numpy(masks), Boxes(torch.from_numpy(boxes)), (H, W), threshold=-1
    )
    save(
        "paste_masks",
        masks=masks,
        boxes=boxes,
        image_hw=np.array([H, W], np.int32),
        pasted_binary=t2n(out).astype(np.uint8),
        pasted_raw=t2n(raw.float()) if raw.dtype == torch.uint8 else t2n(raw),
    )


# ------------------------------------------------------------------ keypoints


def golden_keypoints():
    from detectron2.structures.keypoints import Keypoints, heatmaps_to_keypoints

    rng = np.random.RandomState(11)
    N, K, S = 6, 17, 56
    boxes = []
    for _ in range(N):
        x1, y1 = rng.rand(2) * 50
        w, h = rng.rand(2) * 80 + 8
        boxes.append([x1, y1, x1 + w, y1 + h])
    boxes = np.array(boxes, np.float32)
    kpts = np.zeros((N, K, 3), np.float32)
    for i in range(N):
        kpts[i, :, 0] = boxes[i, 0] + rng.rand(K) * (boxes[i, 2] - boxes[i, 0]) * 1.1 - 2
        kpts[i, :, 1] = boxes[i, 1] + rng.rand(K) * (boxes[i, 3] - boxes[i, 1]) * 1.1 - 2
        kpts[i, :, 2] = rng.randint(0, 3, K)

    hm, valid = Keypoints(torch.from_numpy(kpts)).to_heatmap(torch.from_numpy(boxes), S)

    # smooth Gaussian-blob heatmaps: the reference decodes via per-roi bicubic
    # resize, our framework via static bilinear upsample — argmax on smooth
    # unimodal maps is where the two designs must agree (random noise would
    # pin interpolation artifacts, not keypoint semantics)
    yy, xx = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    maps = np.zeros((N, K, S, S), np.float32)
    for i in range(N):
        for k in range(K):
            cy, cx = rng.rand(2) * (S - 8) + 4
            sig = rng.rand() * 3 + 2
            maps[i, k] = 8 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    decoded = heatmaps_to_keypoints(torch.from_numpy(maps), torch.from_numpy(boxes))
    save(
        "keypoints",
        kpts=kpts,
        boxes=boxes,
        heatmap_size=np.array([S]),
        enc_indices=t2n(hm),
        enc_valid=t2n(valid),
        maps=maps,
        decoded=t2n(decoded),
    )


# ------------------------------------------------------------------ proposal selection


def golden_find_top_rpn_proposals():
    from detectron2.modeling.proposal_generator.proposal_utils import find_top_rpn_proposals
    from detectron2.structures import Boxes

    rng = np.random.RandomState(7)
    B = 2
    image_sizes = [(180, 240), (200, 150)]
    level_hw = [(24, 32), (12, 16), (6, 8)]
    proposals, logits = [], []
    for (h, w) in level_hw:
        n = h * w * 3
        cx = rng.rand(B, n) * 240
        cy = rng.rand(B, n) * 200
        bw = rng.rand(B, n) * 90 + 2
        bh = rng.rand(B, n) * 90 + 2
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1).astype(
            np.float32
        )
        proposals.append(torch.from_numpy(boxes))
        logits.append(torch.from_numpy(rng.randn(B, n).astype(np.float32)))

    out = find_top_rpn_proposals(
        proposals,
        logits,
        image_sizes,
        nms_thresh=0.7,
        pre_nms_topk=200,
        post_nms_topk=80,
        min_box_size=1.0,
        training=False,
    )
    save(
        "find_top_rpn_proposals",
        image_sizes=np.array(image_sizes, np.int32),
        lvl0_boxes=t2n(proposals[0]),
        lvl1_boxes=t2n(proposals[1]),
        lvl2_boxes=t2n(proposals[2]),
        lvl0_logits=t2n(logits[0]),
        lvl1_logits=t2n(logits[1]),
        lvl2_logits=t2n(logits[2]),
        out0_boxes=t2n(out[0].proposal_boxes.tensor),
        out0_logits=t2n(out[0].objectness_logits),
        out1_boxes=t2n(out[1].proposal_boxes.tensor),
        out1_logits=t2n(out[1].objectness_logits),
    )


# ------------------------------------------------------------------ fast_rcnn_inference


def golden_fast_rcnn_inference():
    from detectron2.modeling.roi_heads.fast_rcnn import fast_rcnn_inference

    rng = np.random.RandomState(5)
    R, C = 300, 8
    image_shape = (160, 220)
    scores = torch.from_numpy(
        torch.softmax(torch.from_numpy(rng.randn(R, C + 1).astype(np.float32) * 2), -1).numpy()
    )
    x1 = rng.rand(R, C) * 200
    y1 = rng.rand(R, C) * 140
    bw = rng.rand(R, C) * 70 + 2
    bh = rng.rand(R, C) * 70 + 2
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], -1).reshape(R, C * 4).astype(np.float32)

    insts, _ = fast_rcnn_inference(
        [torch.from_numpy(boxes)],
        [scores],
        [image_shape],
        score_thresh=0.05,
        nms_thresh=0.5,
        topk_per_image=100,
    )
    inst = insts[0]
    save(
        "fast_rcnn_inference",
        scores=t2n(scores),
        boxes=boxes,
        image_shape=np.array(image_shape, np.int32),
        out_boxes=t2n(inst.pred_boxes.tensor),
        out_scores=t2n(inst.scores),
        out_classes=t2n(inst.pred_classes),
    )


# ------------------------------------------------------------------ box2box (incl. rotated)


def golden_box2box():
    from detectron2.modeling.box_regression import Box2BoxTransform, Box2BoxTransformRotated

    rng = np.random.RandomState(9)
    N = 64
    src = rng.rand(N, 4).astype(np.float32) * 100
    src[:, 2:] = src[:, :2] + rng.rand(N, 2).astype(np.float32) * 80 + 1
    tgt = rng.rand(N, 4).astype(np.float32) * 100
    tgt[:, 2:] = tgt[:, :2] + rng.rand(N, 2).astype(np.float32) * 80 + 1
    b2b = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    deltas = b2b.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt))
    # include extreme deltas to pin the log(1000/16) clamp
    wild = rng.randn(N, 4).astype(np.float32) * 4
    applied = b2b.apply_deltas(torch.from_numpy(wild), torch.from_numpy(src))

    rsrc = np.stack(
        [
            rng.rand(N) * 100,
            rng.rand(N) * 100,
            rng.rand(N) * 60 + 2,
            rng.rand(N) * 60 + 2,
            rng.rand(N) * 360 - 180,
        ],
        1,
    ).astype(np.float32)
    rtgt = np.stack(
        [
            rng.rand(N) * 100,
            rng.rand(N) * 100,
            rng.rand(N) * 60 + 2,
            rng.rand(N) * 60 + 2,
            rng.rand(N) * 360 - 180,
        ],
        1,
    ).astype(np.float32)
    rb2b = Box2BoxTransformRotated(weights=(10.0, 10.0, 5.0, 5.0, 1.0))
    rdeltas = rb2b.get_deltas(torch.from_numpy(rsrc), torch.from_numpy(rtgt))
    rwild = rng.randn(N, 5).astype(np.float32) * 2
    rapplied = rb2b.apply_deltas(torch.from_numpy(rwild), torch.from_numpy(rsrc))

    save(
        "box2box",
        src=src,
        tgt=tgt,
        deltas=t2n(deltas),
        wild=wild,
        applied=t2n(applied),
        rsrc=rsrc,
        rtgt=rtgt,
        rdeltas=t2n(rdeltas),
        rwild=rwild,
        rapplied=t2n(rapplied),
    )


# ------------------------------------------------------------------ matcher


def golden_matcher():
    from detectron2.modeling.matcher import Matcher

    rng = np.random.RandomState(13)
    M, N = 7, 120
    iou = rng.rand(M, N).astype(np.float32)
    matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    matches, labels = matcher(torch.from_numpy(iou))
    matcher2 = Matcher([0.5], [0, 1], allow_low_quality_matches=False)
    matches2, labels2 = matcher2(torch.from_numpy(iou))
    save(
        "matcher",
        iou=iou,
        matches_lq=t2n(matches),
        labels_lq=t2n(labels),
        matches_plain=t2n(matches2),
        labels_plain=t2n(labels2),
    )


# ------------------------------------------------------------------ roi_align oracle


def golden_roi_align():
    """Goldens from the stub's slow direct-definition ROIAlign (independent
    of both torchvision and detectron2_tpu)."""
    rng = np.random.RandomState(17)
    N, C, H, W = 2, 3, 24, 32
    feat = rng.randn(N, C, H, W).astype(np.float32)
    rois = np.array(
        [
            [0, 2.0, 3.0, 20.0, 18.0],
            [0, -4.0, -2.0, 10.0, 12.0],  # partially out of bounds
            [1, 0.5, 0.5, 30.5, 22.5],
            [1, 10.0, 5.0, 11.5, 6.5],  # tiny box
            [0, 25.0, 15.0, 40.0, 30.0],  # spills past the right/bottom edge
        ],
        np.float32,
    )
    out_aligned = stubs._tv_roi_align(
        torch.from_numpy(feat), torch.from_numpy(rois), (7, 7), 0.5, 2, aligned=True
    )
    out_legacy = stubs._tv_roi_align(
        torch.from_numpy(feat), torch.from_numpy(rois), (7, 7), 0.5, 2, aligned=False
    )
    out_adaptive = stubs._tv_roi_align(
        torch.from_numpy(feat), torch.from_numpy(rois), (7, 7), 0.5, -1, aligned=True
    )
    save(
        "roi_align",
        feat=feat,
        rois=rois,
        out_aligned=t2n(out_aligned),
        out_legacy=t2n(out_legacy),
        out_adaptive=t2n(out_adaptive),
    )


if __name__ == "__main__":
    for fn in [
        golden_box2box,
        golden_matcher,
        golden_paste_masks,
        golden_keypoints,
        golden_fast_rcnn_inference,
        golden_find_top_rpn_proposals,
        golden_roi_align,
        golden_rpn,
    ]:
        print(f"--- {fn.__name__}")
        fn()
    print("all goldens written to", OUT)


def golden_augmentations():
    """Seeded augmentation policies: with the same np.random seed our policies
    must emit identical transform parameters (RNG call order is part of the
    contract we preserve)."""
    from detectron2.data import transforms as T

    rows = {}

    np.random.seed(42)
    shapes = []
    aug = T.ResizeShortestEdge((480, 800), max_size=1333, sample_style="range")
    for i in range(10):
        img = np.zeros((np.random.randint(200, 1200), np.random.randint(200, 1200), 3), np.uint8)
        t = aug.get_transform(img)
        shapes.append([img.shape[0], img.shape[1], getattr(t, "new_h", img.shape[0]), getattr(t, "new_w", img.shape[1])])
    rows["resize_shortest"] = np.array(shapes, np.int64)

    np.random.seed(7)
    crops = []
    for ct, cs in [("relative", (0.7, 0.6)), ("relative_range", (0.4, 0.4)),
                   ("absolute", (300, 250)), ("absolute_range", (200, 400))]:
        aug = T.RandomCrop(ct, cs)
        img = np.zeros((600, 900, 3), np.uint8)
        for i in range(5):
            t = aug.get_transform(img)
            crops.append([t.x0, t.y0, t.w, t.h])
    rows["random_crop"] = np.array(crops, np.int64)

    np.random.seed(3)
    exts = []
    aug = T.RandomExtent((0.6, 1.4), (0.3, 0.3))
    img = np.zeros((480, 640, 3), np.uint8)
    for i in range(8):
        t = aug.get_transform(img)
        exts.append(list(t.src_rect) + list(t.output_size))
    rows["random_extent"] = np.array(exts, np.float64)

    np.random.seed(11)
    rots = []
    aug = T.RandomRotation([-30, 30], expand=True, sample_style="range")
    img = np.zeros((300, 400, 3), np.uint8)
    for i in range(8):
        t = aug.get_transform(img)
        rots.append([getattr(t, "angle", 0.0)])
    rows["random_rotation"] = np.array(rots, np.float64)

    save("augmentations", **rows)


def synth_weight_value(name: str, shape) -> np.ndarray:
    """Deterministic per-name synthetic weight: the test regenerates the SAME
    values from the vendored (name, shape) list, so the 45MB weight blob never
    needs to be stored."""
    import zlib

    rng = np.random.RandomState(zlib.crc32(name.encode()) & 0x7FFFFFFF)
    if name.endswith("running_var"):
        return (np.abs(rng.standard_normal(shape)) * 0.5 + 0.5).astype(np.float32)
    if name.endswith("running_mean"):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)
    if "cls_score" in name and name.endswith("weight"):
        # spread classification scores: with uniformly tiny weights every
        # detection scores ~sigmoid(0) and near-tie NMS ordering becomes
        # implementation-noise sensitive (a degenerate parity fixture)
        return (rng.standard_normal(shape) * 0.3).astype(np.float32)
    if name.endswith("bbox_pred.weight") and len(shape) == 4 and shape[0] == 4:
        # FCOS's single-point box head: tiny weights leave every box a
        # sub-pixel sliver at its anchor point (all-degenerate fixture);
        # larger weights give real box extents. Scoped to the 4-channel conv
        # so anchor-based heads (exp-decode, tie-risk) keep small deltas.
        return (rng.standard_normal(shape) * 3.0).astype(np.float32)
    if name.endswith("ctrness.weight") and len(shape) == 4:
        return (rng.standard_normal(shape) * 2.0).astype(np.float32)
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _e2e_cfg_ref():
    from detectron2.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
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
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    # static sampling on both sides: our fixed-shape RoIAlign uses a static
    # 2-sample grid where the reference's sampling_ratio=0 adapts per roi
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.MASK_ON = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    return cfg


def golden_e2e_maskrcnn():
    """Full Mask R-CNN R18-FPN inference golden: the reference model with
    deterministic synthetic weights on a fixed image. The test regenerates
    the weights, writes them as a d2-format .pkl, loads them through OUR
    checkpointer/converter into OUR model, and must reproduce these
    detections — the end-to-end numeric pin for the whole inference stack
    including the weight converter."""
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked",)) or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(123)
    img = rng.randint(0, 255, (320, 320, 3)).astype(np.uint8)
    inp = {
        "image": torch.from_numpy(img.transpose(2, 0, 1)).float(),
        "height": 320,
        "width": 320,
    }
    with torch.no_grad():
        out = model([inp])[0]["instances"]

        # intermediate stages for bisection
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, feats, None)
        from detectron2.structures import Boxes as _Boxes
        box_feats = model.roi_heads.box_pooler(
            [feats[f] for f in model.roi_heads.box_in_features],
            [proposals[0].proposal_boxes],
        )
        fc_out = model.roi_heads.box_head(box_feats)

        # raw 28x28 mask probabilities for the top-10 final detections
        mask_feats = model.roi_heads.mask_pooler(
            [feats[f] for f in model.roi_heads.mask_in_features],
            [out.pred_boxes[:10]],
        )
        mask_logits = model.roi_heads.mask_head.layers(mask_feats)
        cls10 = out.pred_classes[:10]
        mask_probs10 = torch.sigmoid(
            mask_logits[torch.arange(len(cls10)), cls10]
        )

    masks = t2n(out.pred_masks[:10]).astype(np.uint8) if out.has("pred_masks") else np.zeros(0)
    inter = {f"feat_{k}": t2n(v) for k, v in feats.items()}
    save(
        "e2e_maskrcnn_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        out_masks10=masks,
        prop_boxes=t2n(proposals[0].proposal_boxes.tensor),
        prop_logits=t2n(proposals[0].objectness_logits),
        box_pooled=t2n(box_feats),
        box_fc=t2n(fc_out),
        mask_probs10=t2n(mask_probs10),
        **inter,
    )


def _structured_image(rng, h, w):
    """Blobs on a gradient + noise: a uniform-noise image gives stationary conv
    features, so every anchor of a dense detector scores within ~1e-2 of every
    other and the top-k cut becomes pure tie-breaking noise (a degenerate
    parity fixture). Spatial structure spreads the scores."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w, yy / h, (xx + yy) / (h + w)], -1) * 80.0
    for _ in range(12):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        sy, sx = rng.uniform(8, 60), rng.uniform(8, 60)
        amp = rng.uniform(40, 170) * rng.choice([-1.0, 1.0], 3)
        blob = np.exp(-(((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2))
        img += blob[..., None] * amp
    img += rng.standard_normal((h, w, 3)).astype(np.float32) * 8.0
    return np.clip(img + 60.0, 0, 255).astype(np.uint8)


def golden_e2e_retinanet():
    """RetinaNet R18-FPN inference golden — the one-stage counterpart of
    golden_e2e_maskrcnn (same synthetic-weight scheme)."""
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
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
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(321)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}

    # deterministic pin: raw head outputs per level (no top-k/NMS selection —
    # random deep weights leave large spatial tie clusters, so NMS-survivor
    # identity is fp-ordering noise; the logit maps are what actually catch
    # converter/wiring bugs)
    inter = {}
    with torch.no_grad():
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        feats_l = [feats[f] for f in model.head_in_features]
        logits, deltas = model.head(feats_l)
        for i, f in enumerate(model.head_in_features):
            inter[f"logits_{f}"] = t2n(logits[i])
            inter[f"deltas_{f}"] = t2n(deltas[i])
        out = model([inp])[0]["instances"]
    save(
        "e2e_retinanet_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        **inter,
    )


def golden_e2e_keypoint_rcnn():
    """Keypoint R-CNN R18-FPN inference golden — extends the e2e evidence
    chain to the keypoint head + heatmap decode. Pins the raw 56x56 keypoint
    logits for the top detections (deterministic) plus the decoded keypoints
    (bin-level tolerance: our decode upsamples by a static factor where the
    reference interpolates to each roi's pixel size)."""
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (64, 64)
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 17
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(77)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]["instances"]
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        kpt_feats = model.roi_heads.keypoint_pooler(
            [feats[f] for f in model.roi_heads.keypoint_in_features],
            [out.pred_boxes[:10]],
        )
        kpt_logits = model.roi_heads.keypoint_head.layers(kpt_feats)  # [10,17,56,56]
    save(
        "e2e_keypointrcnn_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        out_keypoints=t2n(out.pred_keypoints),  # [D,17,3] x,y,score
        kpt_logits10=t2n(kpt_logits),
    )


def golden_e2e_cascade_rcnn():
    """Cascade R-CNN R18-FPN inference golden — pins the 3-stage cascade:
    per-stage rematching-free inference refinement, cls-agnostic box
    regression, and score averaging across stage heads."""
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 30
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(55)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]["instances"]
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, feats, None)
    save(
        "e2e_cascadercnn_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        prop_boxes=t2n(proposals[0].proposal_boxes.tensor),
    )


def golden_e2e_maskrcnn_c4():
    """Mask R-CNN R18-C4 inference golden — pins the C4 path: bare ResNet
    backbone (res4 out), single-level pooler, shared res5 box/mask feature
    extractor (Res5ROIHeads), and the C4 deconv mask head."""
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
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
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(99)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]["instances"]
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, feats, None)
        # raw 28x28 mask probs for the top-10 detections through the shared res5
        mask_feats = model.roi_heads.pooler(
            [feats[f] for f in model.roi_heads.in_features], [out.pred_boxes[:10]]
        )
        res5_out = model.roi_heads.res5(mask_feats)
        mask_logits = model.roi_heads.mask_head.layers(res5_out)
        cls10 = out.pred_classes[:10]
        mask_probs10 = torch.sigmoid(mask_logits[torch.arange(len(cls10)), cls10])
    save(
        "e2e_maskrcnn_c4_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        prop_boxes=t2n(proposals[0].proposal_boxes.tensor),
        prop_logits=t2n(proposals[0].objectness_logits),
        feat_res4=t2n(feats["res4"]),
        mask_probs10=t2n(mask_probs10),
    )


def golden_e2e_semseg():
    """SemanticSegmentor R18-FPN inference golden — the fully deterministic
    per-pixel path (no NMS/topk): pins SemSegFPNHead's scale-head sums,
    GN conv stacks, and the 4x final upsample."""
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(31)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]["sem_seg"]  # [C, 320, 320] logits
    save(
        "e2e_semseg_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        sem_seg=t2n(out),
    )


def golden_e2e_panoptic_fpn():
    """PanopticFPN R18 inference golden — pins the joint model plus the
    greedy panoptic fusion (combine_semantic_and_instance_outputs:
    score-sorted instance paste, overlap threshold, stuff area limit)."""
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
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
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(41)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]
    pan_seg, segments_info = out["panoptic_seg"]
    inst = out["instances"]
    seg_rows = np.array(
        [
            [
                s["id"],
                int(s["isthing"]),
                s["category_id"],
                int(s.get("instance_id", -1)) if s["isthing"] else int(s.get("area", -1)),
            ]
            for s in segments_info
        ],
        np.int64,
    ).reshape(-1, 4)
    save(
        "e2e_panoptic_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        pan_seg=t2n(pan_seg),
        seg_rows=seg_rows,
        out_boxes=t2n(inst.pred_boxes.tensor),
        out_scores=t2n(inst.scores),
        out_classes=t2n(inst.pred_classes),
        sem_seg=t2n(out["sem_seg"]),
    )


def golden_vitdet_backbone():
    """ViT + SimpleFeaturePyramid backbone golden (the ViTDet trunk):
    pins windowed + global attention with decomposed rel-pos, abs-pos
    interpolation (pretrain 224 grid -> 256 input), the SFP deconv/LN/lateral
    towers, and the converter's ViT/SFP name + layout mapping."""
    from detectron2.modeling.backbone.vit import ViT, SimpleFeaturePyramid
    from detectron2.modeling.backbone.fpn import LastLevelMaxPool

    net = ViT(
        img_size=256,
        patch_size=16,
        embed_dim=64,
        depth=4,
        num_heads=2,
        drop_path_rate=0.0,
        window_size=8,
        mlp_ratio=4,
        qkv_bias=True,
        window_block_indexes=[0, 2],
        use_rel_pos=True,
        # pretrain grid == input grid: no abs-pos interpolation, so the pin
        # is independent of bicubic-resize implementation differences
        pretrain_img_size=256,
        out_feature="last_feat",
    )
    bb = SimpleFeaturePyramid(
        net=net,
        in_feature="last_feat",
        out_channels=48,
        scale_factors=(4.0, 2.0, 1.0, 0.5),
        top_block=LastLevelMaxPool(),
        norm="LN",
        square_pad=256,
    )
    bb.eval()

    sd = bb.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    bb.load_state_dict(new_sd)

    rng = np.random.RandomState(21)
    img = _structured_image(rng, 256, 256).astype(np.float32) / 127.5 - 1.0
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        feats = bb(x)
    save(
        "vitdet_backbone",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        **{f"feat_{k}": t2n(v) for k, v in feats.items()},
    )


def golden_swin_backbone():
    """Swin-tiny-ish backbone golden: pins shifted-window attention with
    relative-position bias, cyclic-shift masking, patch merging (quadrant
    concat order), and the Swin converter name mapping."""
    from detectron2.modeling.backbone.swin import SwinTransformer

    bb = SwinTransformer(
        pretrain_img_size=224,
        patch_size=4,
        embed_dim=32,
        depths=(2, 2),
        num_heads=(2, 4),
        window_size=7,
        drop_path_rate=0.0,
        ape=False,
        patch_norm=True,
        out_indices=(0, 1),
    )
    bb.eval()

    sd = bb.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if "relative_position_index" in k or "attn_mask" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    bb.load_state_dict(new_sd)

    rng = np.random.RandomState(61)
    img = _structured_image(rng, 224, 224).astype(np.float32) / 127.5 - 1.0
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        feats = bb(x)
    save(
        "swin_backbone",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        **{f"feat_{k}": t2n(v) for k, v in feats.items()},
    )


def golden_mvit_backbone():
    """MViTv2-tiny-ish backbone golden: pins pooled multiscale attention
    (shared per-head depthwise pool convs + post-pool LN), the hybrid
    window/global schedule, adaptive kv strides, runtime-interpolated rel-pos,
    residual pooling, and the MViT converter name mapping."""
    from detectron2.modeling.backbone.mvit import MViT

    bb = MViT(
        img_size=224,
        embed_dim=32,
        depth=6,
        num_heads=1,
        last_block_indexes=(0, 2, 4, 5),
        drop_path_rate=0.0,
        use_rel_pos=True,
        use_abs_pos=False,
        out_features=("scale2", "scale3", "scale4", "scale5"),
    )
    bb.eval()

    sd = bb.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    bb.load_state_dict(new_sd)

    rng = np.random.RandomState(71)
    img = _structured_image(rng, 224, 224).astype(np.float32) / 127.5 - 1.0
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        feats = bb(x)
    save(
        "mvit_backbone",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        **{f"feat_{k}": t2n(v) for k, v in feats.items()},
    )


def golden_regnet_backbone():
    """RegNetY backbone golden: pins the width-ladder parameterization,
    grouped bottleneck blocks with SE, and the RegNet converter name mapping
    (stem conv/bn, sX.bY.f.{a,b,c}_bn siblings, se.f_ex indices)."""
    from detectron2.modeling.backbone.regnet import RegNet, ResBottleneckBlock, SimpleStem

    bb = RegNet(
        stem_class=SimpleStem,
        stem_width=16,
        block_class=ResBottleneckBlock,
        depth=8,
        w_a=24.48,
        w_0=24,
        w_m=2.54,
        group_width=8,
        se_ratio=0.25,
        out_features=["s1", "s2", "s3"],
    )
    bb.eval()

    sd = bb.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    bb.load_state_dict(new_sd)

    rng = np.random.RandomState(81)
    img = _structured_image(rng, 224, 224).astype(np.float32) / 127.5 - 1.0
    x = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        feats = bb(x)
    save(
        "regnet_backbone",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        **{f"feat_{k}": t2n(v) for k, v in feats.items()},
    )


def golden_e2e_fcos():
    """FCOS R18-FPN inference golden — the anchor-free one-stage path:
    point anchors, linear (stride-normalized) box transform, centerness
    scoring sqrt(cls*ctr), GN dense heads."""
    from detectron2.config import get_cfg
    from detectron2.modeling import build_backbone
    from detectron2.modeling.meta_arch.fcos import FCOS, FCOSHead

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    backbone = build_backbone(cfg)

    feats = ["p3", "p4", "p5", "p6", "p7"]
    shapes = [backbone.output_shape()[f] for f in feats]
    head = FCOSHead(input_shape=shapes, conv_dims=[64, 64], norm="GN", num_classes=7)
    model = FCOS(
        backbone=backbone,
        head=head,
        head_in_features=feats,
        num_classes=7,
        test_score_thresh=0.2,
        test_nms_thresh=0.6,
        max_detections_per_image=100,
        pixel_mean=[103.530, 116.280, 123.675],
        pixel_std=[1.0, 1.0, 1.0],
    )
    model.eval()

    sd = model.state_dict()
    names, shp = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shp.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(91)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        images = model.preprocess_image([inp])
        fs = model.backbone(images.tensor)
        fl = [fs[f] for f in feats]
        logits, deltas, ctrness = model.head(fl)
        inter = {}
        for i, f in enumerate(feats):
            inter[f"logits_{f}"] = t2n(logits[i])
            inter[f"deltas_{f}"] = t2n(deltas[i])
            inter[f"ctrness_{f}"] = t2n(ctrness[i])
        out = model([inp])[0]["instances"]
    save(
        "e2e_fcos_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shp),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        **inter,
    )


def golden_e2e_deeplab():
    """DeepLabV3+ R50 (deeplab backbone) semantic segmentation golden — pins
    the DeepLab ResNet (3-conv stem, res5 dilation + multi-grid), the ASPP
    module (atrous branches + image pooling), and the V3+ decoder (projected
    low-level fusion with two stacked 3x3 fuse convs)."""
    import sys

    sys.path.insert(0, "/root/reference/projects/DeepLab")
    from deeplab import add_deeplab_config  # noqa
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    add_deeplab_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deeplab_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res5"]
    cfg.MODEL.RESNETS.RES5_MULTI_GRID = [1, 2, 4]
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.RESNETS.STEM_TYPE = "deeplab"
    cfg.MODEL.SEM_SEG_HEAD.NAME = "DeepLabV3PlusHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES = ["res2"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [48]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS = [6, 12, 18]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 64
    cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.NORM = "BN"
    cfg.MODEL.SEM_SEG_HEAD.LOSS_TYPE = "cross_entropy"
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(101)
    img = _structured_image(rng, 256, 256)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 256, "width": 256}
    with torch.no_grad():
        out = model([inp])[0]["sem_seg"]  # [C, 256, 256]
    save(
        "e2e_deeplab_r50",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        sem_seg=t2n(out),
    )


def golden_e2e_pointrend():
    """PointRend e2e golden (reference projects/PointRend/point_rend/mask_head.py
    PointRendMaskHead): pins the point-sampled coarse pooling (ConvFCHead with
    channel+spatial reduce convs), the Conv1d point head, and the subdivision
    inference loop incl. the init-resolution doubling shortcut
    (7 -> start at 14, 2 remaining steps -> 56x56 masks)."""
    import sys

    sys.path.insert(0, "/root/reference/projects/PointRend")
    from point_rend import add_pointrend_config  # noqa
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    add_pointrend_config(cfg)
    cfg.MODEL.ROI_MASK_HEAD.NAME = "PointRendMaskHead"
    cfg.MODEL.ROI_MASK_HEAD.POOLER_TYPE = ""
    cfg.MODEL.ROI_MASK_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    # conv_dim < FPN channels (64) so the optional reduce_channel_dim_conv exists
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.POINT_HEAD_ON = True
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 7
    cfg.MODEL.POINT_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.POINT_HEAD.FC_DIM = 32
    cfg.MODEL.POINT_HEAD.NUM_FC = 3
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 3
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 196

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(321)
    img = _structured_image(rng, 320, 320)
    inp = {
        "image": torch.from_numpy(img.transpose(2, 0, 1)).float(),
        "height": 320,
        "width": 320,
    }
    with torch.no_grad():
        raw = model.inference([inp], do_postprocess=False)[0]
    save(
        "e2e_pointrend_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(raw.pred_boxes.tensor),
        out_scores=t2n(raw.scores),
        out_classes=t2n(raw.pred_classes),
        mask_probs10=t2n(raw.pred_masks[:10, 0]),
    )


def golden_e2e_tridentnet():
    """TridentNet-Fast R50-C4 inference golden (reference projects/TridentNet):
    pins the trident backbone's weight-shared multi-dilation res4 (fast test
    path = single middle branch, dilation 2), TridentRPN's single-branch test
    behavior, and the C4 Res5 box head through our converter."""
    import sys

    sys.path.insert(0, "/root/reference/projects/TridentNet")
    from tridentnet import add_tridentnet_config  # noqa
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_trident_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "TridentRPN"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 300
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.ROI_HEADS.NAME = "TridentRes5ROIHeads"
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
    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(555)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        out = model([inp])[0]["instances"]
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, feats, None)
    save(
        "e2e_tridentnet_r50",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        prop_boxes=t2n(proposals[0].proposal_boxes.tensor),
        prop_logits=t2n(proposals[0].objectness_logits),
        feat_res4=t2n(feats["res4"]),
    )


def golden_e2e_densepose():
    """DensePose chart e2e golden (reference projects/DensePose): pins the
    FPN Decoder (scale heads + 1x1 predictor), the V1ConvX tower
    (body_conv_fcn*), and the chart predictor's four *_lowres deconvs +
    bilinear interp2d through our converter. Saves detections plus the raw
    DensePoseChartPredictorOutput maps for the kept detections."""
    import sys

    sys.path.insert(0, "/root/reference/projects/DensePose")
    from densepose import add_densepose_config  # noqa
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    add_densepose_config(cfg)
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseV1ConvXHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 20

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(777)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        raw = model.inference([inp], do_postprocess=False)[0]
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        dec = model.roi_heads.decoder([feats[f] for f in model.roi_heads.in_features])
    dp = raw.pred_densepose
    save(
        "e2e_densepose_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(raw.pred_boxes.tensor),
        out_scores=t2n(raw.scores),
        out_classes=t2n(raw.pred_classes),
        dp_coarse_segm=t2n(dp.coarse_segm),
        dp_fine_segm=t2n(dp.fine_segm),
        dp_u=t2n(dp.u),
        dp_v=t2n(dp.v),
        decoder_map=t2n(dec),
    )


def golden_e2e_panoptic_deeplab():
    """Panoptic-DeepLab e2e golden (reference projects/Panoptic-DeepLab):
    pins the semantic head's 2-conv head tower, the instance-embedding branch
    (own V3+ decoder + center/offset towers + predictors), and the
    center-grouping panoptic post-processing through our converter."""
    import sys

    sys.path.insert(0, "/root/reference/projects/DeepLab")
    sys.path.insert(0, "/root/reference/projects/Panoptic-DeepLab")
    from panoptic_deeplab import add_panoptic_deeplab_config  # noqa
    from detectron2.config import get_cfg
    from detectron2.data import MetadataCatalog
    from detectron2.modeling import build_model

    cfg = get_cfg()
    add_panoptic_deeplab_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.META_ARCHITECTURE = "PanopticDeepLab"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deeplab_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.RESNETS.RES5_MULTI_GRID = [1, 2, 4]
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.RESNETS.STEM_TYPE = "deeplab"
    cfg.MODEL.SEM_SEG_HEAD.NAME = "PanopticDeepLabSemSegHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES = ["res2", "res3"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [16, 32]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS = [6, 12, 18]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 64
    cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.NORM = "BN"
    cfg.MODEL.INS_EMBED_HEAD.IN_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.INS_EMBED_HEAD.PROJECT_FEATURES = ["res2", "res3"]
    cfg.MODEL.INS_EMBED_HEAD.PROJECT_CHANNELS = [16, 32]
    cfg.MODEL.INS_EMBED_HEAD.ASPP_CHANNELS = 64
    cfg.MODEL.INS_EMBED_HEAD.ASPP_DROPOUT = 0.0
    cfg.MODEL.INS_EMBED_HEAD.CONVS_DIM = 32
    cfg.MODEL.INS_EMBED_HEAD.HEAD_CHANNELS = 16
    cfg.MODEL.INS_EMBED_HEAD.NORM = "BN"
    cfg.DATASETS.TRAIN = ("pdl_oracle_test",)
    meta = MetadataCatalog.get("pdl_oracle_test")
    meta.label_divisor = 1000
    meta.thing_dataset_id_to_contiguous_id = {101: 5, 102: 6, 103: 7, 104: 8}
    meta.stuff_dataset_id_to_contiguous_id = {i: i for i in range(5)}
    meta.ignore_label = 255

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(202)
    img = _structured_image(rng, 256, 256)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 256, "width": 256}
    with torch.no_grad():
        images = model.preprocess_image if False else None  # noqa (no helper on this arch)
        x = (inp["image"] - model.pixel_mean) / model.pixel_std
        feats = model.backbone(x.unsqueeze(0))
        sem, _ = model.sem_seg_head(feats, None, None)
        center, offset, _, _ = model.ins_embed_head(feats, None, None, None, None)

    # grouping parity on a handcrafted NON-degenerate input (random-weight
    # maps leave no center above threshold): two things + stuff regions
    from panoptic_deeplab.post_processing import get_panoptic_segmentation

    H = W = 64
    syn_sem = np.zeros((H, W), np.int64)
    syn_sem[:, 32:] = 6  # thing class on the right half
    syn_sem[48:, :32] = 2  # stuff class bottom-left
    syn_center = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for cy, cx in ((16, 48), (48, 48)):
        syn_center += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 6.0**2))
    syn_offset = rng.randn(2, H, W).astype(np.float32) * 2.0
    pan_syn, _ = get_panoptic_segmentation(
        torch.from_numpy(syn_sem).unsqueeze(0),
        torch.from_numpy(syn_center).unsqueeze(0),
        torch.from_numpy(syn_offset),
        thing_ids={5, 6, 7, 8},
        label_divisor=1000,
        stuff_area=64,
        void_label=-1,
        threshold=0.1,
        nms_kernel=7,
        top_k=200,
    )
    save(
        "e2e_panoptic_deeplab_r50",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        sem_seg=t2n(sem[0]),
        center=t2n(center[0]),
        offset=t2n(offset[0]),
        syn_sem=syn_sem,
        syn_center=syn_center,
        syn_offset=syn_offset,
        syn_panoptic=t2n(pan_syn.squeeze(0)),
    )


def golden_e2e_tta():
    """GeneralizedRCNNWithTTA golden on the Mask R-CNN R18 fixture
    (reference modeling/test_time_augmentation.py:101-307): pins the
    multi-scale+flip protocol — per-copy detection, inverse-transform box
    union, one-hot fast_rcnn merge NMS, mask-head re-run on merged boxes in
    every augmented frame, probability averaging, paste."""
    from detectron2.modeling import build_model
    from detectron2.modeling.test_time_augmentation import GeneralizedRCNNWithTTA

    cfg = _e2e_cfg_ref()
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (256, 320)
    cfg.TEST.AUG.MAX_SIZE = 512
    cfg.TEST.AUG.FLIP = True

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    tta = GeneralizedRCNNWithTTA(cfg, model, batch_size=1)
    rng = np.random.RandomState(123)
    img = rng.randint(0, 255, (320, 320, 3)).astype(np.uint8)  # SAME as maskrcnn golden
    inp = {
        "image": torch.from_numpy(img.transpose(2, 0, 1)),  # uint8 CHW -> PIL resize path
        "height": 320,
        "width": 320,
    }
    with torch.no_grad():
        out = tta([inp])[0]["instances"]
    masks = t2n(out.pred_masks[:10]).astype(np.uint8) if out.has("pred_masks") else np.zeros(0)
    save(
        "e2e_tta_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(out.pred_boxes.tensor),
        out_scores=t2n(out.scores),
        out_classes=t2n(out.pred_classes),
        out_masks10=masks,
    )


def golden_e2e_densepose_deeplab():
    """DensePose DeepLab head + UV-confidence golden (the zoo's
    R_*_FPN_DL_WC1 family): pins the GN ASPP (1x1 + atrous 6/12/56 + image
    pooling + project), the GN body tower, and the sigma_2_lowres confidence
    deconv of DensePoseChartWithConfidencePredictor."""
    import sys

    sys.path.insert(0, "/root/reference/projects/DensePose")
    from densepose import add_densepose_config  # noqa
    from detectron2.modeling import build_model

    cfg = _e2e_cfg_ref()
    add_densepose_config(cfg)
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseDeepLabHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE = "iid_iso"
    cfg.TEST.DETECTIONS_PER_IMAGE = 20

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(888)
    img = _structured_image(rng, 320, 320)
    inp = {"image": torch.from_numpy(img.transpose(2, 0, 1)).float(), "height": 320, "width": 320}
    with torch.no_grad():
        raw = model.inference([inp], do_postprocess=False)[0]
    dp = raw.pred_densepose
    save(
        "e2e_densepose_dl_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(raw.pred_boxes.tensor),
        out_scores=t2n(raw.scores),
        out_classes=t2n(raw.pred_classes),
        dp_coarse_segm=t2n(dp.coarse_segm),
        dp_fine_segm=t2n(dp.fine_segm),
        dp_u=t2n(dp.u),
        dp_v=t2n(dp.v),
        dp_sigma2=t2n(dp.sigma_2),
    )


def golden_hrfpn_backbone():
    """HRNet + HRFPN backbone golden (reference densepose/modeling/hrnet.py +
    hrfpn.py): a reduced HRNet (2 modules deep) + 5-level HRFPN on a fixed
    image — pins the stem, Bottleneck layer1, transitions, branch towers,
    fuse mesh, the padding-0 interp deconvs, reduction convs and fpn convs
    through our converter."""
    import sys

    sys.path.insert(0, "/root/reference/projects/DensePose")
    from densepose import add_densepose_config  # noqa
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
    # reduced HRNet: fewer modules/blocks, narrow branches
    cfg.MODEL.HRNET.STAGE2.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS = [2, 2]
    cfg.MODEL.HRNET.STAGE2.NUM_CHANNELS = [16, 32]
    cfg.MODEL.HRNET.STAGE3.NUM_MODULES = 2
    cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS = [2, 2, 2]
    cfg.MODEL.HRNET.STAGE3.NUM_CHANNELS = [16, 32, 64]
    cfg.MODEL.HRNET.STAGE4.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS = [2, 2, 2, 2]
    cfg.MODEL.HRNET.STAGE4.NUM_CHANNELS = [16, 32, 64, 128]
    cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p1", "p2", "p3", "p4", "p5"]

    from densepose.modeling.hrfpn import build_hrfpn_backbone
    from detectron2.layers import ShapeSpec

    model = build_hrfpn_backbone(cfg, ShapeSpec(channels=3))
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(909)
    img = _structured_image(rng, 256, 256).astype(np.float32) / 127.5 - 1.0
    x = torch.from_numpy(img.transpose(2, 0, 1)).unsqueeze(0)
    with torch.no_grad():
        feats = model(x)
    save(
        "hrfpn_backbone",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        **{f"feat_{k}": t2n(v) for k, v in feats.items()},
    )


def _install_tensormask_C_stub():
    """Faithful CPU implementation of the reference TensorMask CUDA op
    swap_align2nat (SwapAlign2Nat_cuda.cu:54-248,405-463): quadrilinear
    sampling over (y, x, v, u) with pad_val outside bounds. Registered as
    ``tensormask._C`` so the reference project imports cleanly on this box."""
    import types

    def swap_align2nat_forward(X, lambda_val, pad_val):
        N, C, Hin, Win = X.shape
        V = U = int(round(C ** 0.5))
        assert V * U == C, (V, U, C)
        lam = int(lambda_val)
        Vo, Uo = V * lam, U * lam
        Ho, Wo = -(-Hin // lam), -(-Win // lam)
        x = X.detach().numpy().astype(np.float64).reshape(N, V, U, Hin, Win)

        v = np.arange(Vo, dtype=np.float64)
        u = np.arange(Uo, dtype=np.float64)
        yy = np.arange(Ho, dtype=np.float64)
        xx = np.arange(Wo, dtype=np.float64)
        oy = yy[None, :] * lam + v[:, None] - Vo / 2.0 + 0.5  # [Vo, Ho]
        ox = xx[None, :] * lam + u[:, None] - Uo / 2.0 + 0.5  # [Uo, Wo]
        ov = (v + 0.5) / lam - 0.5  # [Vo]
        ou = (u + 0.5) / lam - 0.5  # [Uo]

        def taps(c):
            f = np.floor(c)
            wc = c - f
            return f.astype(np.int64), f.astype(np.int64) + 1, 1.0 - wc, wc

        oyf, oyc, oywf, oywc = taps(oy)
        oxf, oxc, oxwf, oxwc = taps(ox)
        ovf, ovc, ovwf, ovwc = taps(ov)
        ouf, ouc, ouwf, ouwc = taps(ou)

        out = np.zeros((N, Vo, Uo, Ho, Wo), np.float64)
        for yi, yw in ((oyf, oywf), (oyc, oywc)):
            for xi, xw in ((oxf, oxwf), (oxc, oxwc)):
                for vi, vw in ((ovf, ovwf), (ovc, ovwc)):
                    for ui, uw in ((ouf, ouwf), (ouc, ouwc)):
                        ok = (
                            ((yi >= 0) & (yi < Hin))[:, None, :, None]
                            & ((xi >= 0) & (xi < Win))[None, :, None, :]
                            & ((vi >= 0) & (vi < V))[:, None, None, None]
                            & ((ui >= 0) & (ui < U))[None, :, None, None]
                        )  # [Vo, Uo, Ho, Wo]
                        yb = np.clip(yi, 0, Hin - 1)[:, None, :, None]
                        xb = np.clip(xi, 0, Win - 1)[None, :, None, :]
                        vb = np.clip(vi, 0, V - 1)[:, None, None, None]
                        ub = np.clip(ui, 0, U - 1)[None, :, None, None]
                        yb, xb, vb, ub = np.broadcast_arrays(yb, xb, vb, ub)
                        vals = x[:, vb, ub, yb, xb]  # [N, Vo, Uo, Ho, Wo]
                        vals = np.where(ok[None], vals, float(pad_val))
                        w = (
                            yw[:, None, :, None]
                            * xw[None, :, None, :]
                            * vw[:, None, None, None]
                            * uw[None, :, None, None]
                        )
                        out += w[None] * vals
        return torch.from_numpy(out.reshape(N, Vo * Uo, Ho, Wo).astype(np.float32))

    mod = types.ModuleType("tensormask._C")
    mod.swap_align2nat_forward = swap_align2nat_forward
    mod.swap_align2nat_backward = None  # inference-only oracle
    sys.modules["tensormask._C"] = mod


def golden_e2e_tensormask():
    """TensorMask bipyramid e2e golden (reference projects/TensorMask): pins
    the three head towers + per-mask-size predictors + bipyramid fuse +
    swap_align2nat through our converter. Saves raw per-level head maps
    (deterministic), final detections, and the kept detections' native-size
    sigmoid mask windows."""
    _install_tensormask_C_stub()
    sys.path.insert(0, "/root/reference/projects/TensorMask")
    from detectron2.config import get_cfg
    from detectron2.modeling import build_model
    from tensormask import add_tensormask_config  # noqa

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.DEVICE = "cpu"
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

    model = build_model(cfg)
    model.eval()

    sd = model.state_dict()
    names, shapes = [], []
    new_sd = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "cell_anchors" in k or "pixel_" in k:
            new_sd[k] = v
            continue
        arr = synth_weight_value(k, tuple(v.shape))
        new_sd[k] = torch.from_numpy(arr)
        names.append(k)
        shapes.append(",".join(map(str, v.shape)))
    model.load_state_dict(new_sd)

    rng = np.random.RandomState(2024)
    img = _structured_image(rng, 320, 320)
    inp = {
        "image": torch.from_numpy(img.transpose(2, 0, 1)).float(),
        "height": 320,
        "width": 320,
    }

    inter = {}
    with torch.no_grad():
        images = model.preprocess_image([inp])
        feats = model.backbone(images.tensor)
        feats_l = [feats[f] for f in model.in_features]
        pred_logits, pred_deltas, pred_masks = model.head(feats_l)
        for i, f in enumerate(model.in_features):
            inter[f"logits_{f}"] = t2n(pred_logits[i])
            inter[f"deltas_{f}"] = t2n(pred_deltas[i])
        # mask windows for the two finest + one coarse level (keep npz lean)
        for lvl in (0, 1, 4):
            for anc in range(len(model.mask_sizes)):
                inter[f"mask_l{lvl}_a{anc}"] = t2n(pred_masks[lvl][anc])

        anchors, _, indexes = model.anchor_generator(feats_l)
        results, (result_masks, _) = model.inference_single_image(
            _tm_permute(pred_logits, model.num_classes)[0],
            _tm_permute(pred_deltas, 4)[0],
            [[mla[0] for mla in ml] for ml in pred_masks],
            _tm_cat_boxes(anchors[0]),
            torch.cat(indexes[0]),
            tuple(images.image_sizes[0]),
        )

    masks_flat = np.concatenate([t2n(m).reshape(-1) for m in result_masks]) if result_masks else np.zeros(0, np.float32)
    masks_sizes = np.array([m.shape[-1] for m in result_masks], np.int64)
    save(
        "e2e_tensormask_r18",
        image=img,
        weight_names=np.array(names),
        weight_shapes=np.array(shapes),
        out_boxes=t2n(results.pred_boxes.tensor),
        out_scores=t2n(results.scores),
        out_classes=t2n(results.pred_classes),
        out_mask_windows=masks_flat,
        out_mask_sizes=masks_sizes,
        **inter,
    )


def _tm_permute(preds, K):
    from tensormask.arch import permute_to_N_HWA_K
    import torch as _torch

    return _torch.cat([permute_to_N_HWA_K(x, K) for x in preds], dim=1)


def _tm_cat_boxes(boxes_list):
    from detectron2.structures import Boxes

    return Boxes.cat(boxes_list)
