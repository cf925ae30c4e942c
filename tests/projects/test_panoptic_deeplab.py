"""Panoptic-DeepLab project tests: post-processing math, target generation,
and the e2e meta-arch."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.panoptic_deeplab import (
    PanopticDeepLabTargetGenerator,
    add_panoptic_deeplab_config,
    find_instance_center,
    get_panoptic_segmentation,
    group_pixels,
)


def test_find_instance_center():
    h = np.zeros((16, 16), np.float32)
    h[4, 4] = 0.9
    h[12, 10] = 0.8
    h[4, 5] = 0.85  # suppressed by NMS (within the 7x7 window of (4,4)... no:
    # (4,5) is its own local max only if > neighbors; 0.85 < 0.9 so suppressed
    centers, scores = find_instance_center(jnp.asarray(h), threshold=0.1, top_k=5)
    scores = np.asarray(scores)
    centers = np.asarray(centers)
    assert scores[0] == 0.9 and tuple(centers[0]) == (4.0, 4.0)
    assert scores[1] == 0.8 and tuple(centers[1]) == (12.0, 10.0)
    assert (scores[2:] == 0).all()


def test_group_pixels_assigns_nearest_center():
    centers = jnp.asarray([[2.0, 2.0], [10.0, 10.0], [0.0, 0.0]])
    scores = jnp.asarray([0.9, 0.8, 0.0])  # third slot invalid
    offsets = jnp.zeros((12, 12, 2))
    ins = np.asarray(group_pixels(centers, scores, offsets))
    assert ins[2, 2] == 1 and ins[10, 10] == 2
    assert ins[0, 0] == 1  # nearest valid center, never the invalid slot 3


def test_target_generator():
    pan = np.zeros((32, 32), np.int64)
    pan[4:12, 4:12] = 1001  # a thing instance
    pan[20:32, 0:32] = 2000  # stuff
    gen = PanopticDeepLabTargetGenerator(ignore_label=255, thing_ids=[1], sigma=2)
    out = gen(
        pan,
        [
            {"id": 1001, "category_id": 1, "iscrowd": 0},
            {"id": 2000, "category_id": 7, "iscrowd": 0},
        ],
    )
    assert out["gt_sem_seg"][5, 5] == 1 and out["gt_sem_seg"][25, 5] == 7
    assert out["gt_sem_seg"][0, 0] == 255
    # center peak at the instance's mass center (7.5, 7.5), stamped at (8, 8)
    assert out["gt_center"][8, 8] > 0.99
    assert out["gt_center"][7, 7] > 0.7
    # offsets point at the center
    np.testing.assert_allclose(out["gt_offset"][4, 4], [3.5, 3.5])
    assert out["gt_offset_weights"][5, 5] > 0 and out["gt_offset_weights"][25, 5] == 0


def test_panoptic_deeplab_e2e():
    cfg = get_cfg()
    add_panoptic_deeplab_config(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deeplab_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res5"]
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.SEM_SEG_HEAD.NAME = "PanopticDeepLabSemSegHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [32]
    cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.NORM = "GN"
    cfg.MODEL.INS_EMBED_HEAD.NORM = "GN"
    cfg.MODEL.INS_EMBED_HEAD.ASPP_CHANNELS = 32
    cfg.MODEL.INS_EMBED_HEAD.CONVS_DIM = 32
    cfg.MODEL.INS_EMBED_HEAD.HEAD_CHANNELS = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    B, H, W = 1, 64, 64
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[H, W]], jnp.int32),
        "gt_sem_seg": jnp.asarray(rng.randint(0, 6, (B, H, W)).astype(np.int32)),
        "gt_center": jnp.asarray(rng.rand(B, H, W).astype(np.float32)),
        "gt_offset": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
        "gt_center_weights": jnp.ones((B, H, W), jnp.float32),
        "gt_offset_weights": jnp.ones((B, H, W), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    losses = model.apply(variables, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    for k in ["loss_sem_seg", "loss_center", "loss_offset"]:
        assert k in losses and np.isfinite(float(losses[k])), k

    out = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert out["sem_seg"].shape == (B, H, W, 6)
    assert out["center"].shape == (B, H, W)
    assert out["offset"].shape == (B, H, W, 2)

    # fuse one image
    pan, scores = get_panoptic_segmentation(
        jnp.argmax(out["sem_seg"][0], -1),
        jax.nn.sigmoid(out["center"][0]),
        out["offset"][0],
        thing_ids=[0, 1],
        top_k=16,
    )
    assert pan.shape == (H, W)


def test_panoptic_deeplab_pq_wiring(tmp_path):
    """Full PQ loop: postprocess -> COCOPanopticEvaluator -> PQ numbers.
    A perfect prediction of a synthetic panoptic GT must score PQ=100."""
    import json
    import cv2

    from detectron2_tpu.data import MetadataCatalog
    from detectron2_tpu.evaluation.panoptic_evaluation import COCOPanopticEvaluator
    from detectron2_tpu.projects.panoptic_deeplab import panoptic_deeplab_postprocess

    H, W, C = 40, 48, 4
    thing_ids = [0]
    label_divisor = 1000

    # synthetic scene: one thing instance (class 0) on stuff (class 2)
    sem = np.full((H, W), 2, np.int32)
    sem[8:24, 10:30] = 0
    sem_logits = np.full((H, W, C), -10.0, np.float32)
    sem_logits[np.arange(H)[:, None], np.arange(W)[None], sem] = 10.0
    center = np.zeros((H, W), np.float32)
    cy, cx = 16, 20
    center[cy, cx] = 1.0
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    offset = np.stack([cy - yy, cx - xx], -1).astype(np.float32)

    pan, segments_info = panoptic_deeplab_postprocess(
        sem_logits, center, offset, (H, W), thing_ids,
        label_divisor=label_divisor, stuff_area=10, top_k=8,
    )
    assert pan.shape == (H, W)
    cats = sorted(s["category_id"] for s in segments_info)
    assert cats == [0, 2], segments_info
    thing_seg = [s for s in segments_info if s["isthing"]][0]
    assert (pan == thing_seg["id"]).sum() == 16 * 20

    # GT = the prediction itself -> PQ must be 100
    meta_name = "pq_wiring_test"
    meta = MetadataCatalog.get(meta_name)
    meta.thing_dataset_id_to_contiguous_id = {101: 0}
    meta.stuff_dataset_id_to_contiguous_id = {201: 2}
    gt_dir = tmp_path / "pan_gt"
    gt_dir.mkdir()
    gt_ids = np.zeros((H, W), np.uint32)
    seg_infos_gt = []
    for s in segments_info:
        gid = s["id"]
        mask = pan == gid
        gt_ids[mask] = gid
        seg_infos_gt.append(
            {
                "id": int(gid),
                "category_id": 101 if s["isthing"] else 201,
                "iscrowd": 0,
                "area": int(mask.sum()),
            }
        )
    rgb = np.stack([gt_ids % 256, (gt_ids // 256) % 256, gt_ids // (256**2)], -1).astype(np.uint8)
    cv2.imwrite(str(gt_dir / "im0.png"), rgb[:, :, ::-1])
    gt_json = {
        "annotations": [
            {"image_id": 0, "file_name": "im0.png", "segments_info": seg_infos_gt}
        ],
        "categories": [
            {"id": 101, "isthing": 1, "name": "thing"},
            {"id": 201, "isthing": 0, "name": "stuff"},
        ],
    }
    json_path = tmp_path / "gt.json"
    json_path.write_text(json.dumps(gt_json))
    meta.panoptic_json = str(json_path)
    meta.panoptic_root = str(gt_dir)

    ev = COCOPanopticEvaluator(meta_name)
    ev.reset()
    ev.process({"metadata": [{"image_id": 0}]}, {"panoptic_seg": [(pan, segments_info)]})
    res = ev.evaluate()["panoptic_seg"]
    assert abs(res["PQ"] - 100.0) < 1e-6, res
