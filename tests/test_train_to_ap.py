"""Train -> AP closed loop: the offline analogue of the reference's
configs/quick_schedules/*_training_acc_test.yaml protocol
(reference mask_rcnn_R_50_FPN_training_acc_test.yaml:21 trains 6k iters on
coco_2017_val and gates AP through TEST.EXPECTED_RESULTS + verify_results,
reference evaluation/testing.py:31-66).

No real dataset exists in this environment, so a synthetic COCO-format
dataset (solid color-coded rectangles, trivially learnable) is generated on
disk, registered with register_coco_instances, and a tiny Mask R-CNN is
trained to near-overfit through the full DefaultTrainer stack:

    build_detection_train_loader(cfg) -> DatasetMapper -> PaddedBatchCollator
    -> SimpleTrainer SPMD step -> EvalHook -> DefaultTrainer.test
    -> inference_on_dataset -> COCOEvaluator -> verify_results

This is the only place the trained-weights -> evaluator -> metric-gate seam
is exercised end to end.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_COLORS = {0: (220, 50, 40), 1: (40, 210, 60), 2: (50, 70, 225)}  # red, green, blue
_SIZE = 64


def _make_synthetic_coco(root: str, n_images: int = 16, seed: int = 0, keypoints: bool = False):
    """Write n_images PNGs of color-coded rectangles + a COCO json.

    Each image holds 1-2 axis-aligned solid rectangles on a dark noisy
    background; the category is determined by the fill color, so both the
    detector and the mask head can drive the loss to ~0. With
    ``keypoints=True`` each instance also carries 4 visible keypoints (the
    rectangle corners, inset by 2px so the heatmap argmax is unambiguous).
    """
    from PIL import Image

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        img = (rng.rand(_SIZE, _SIZE, 3) * 40).astype(np.uint8)
        n_obj = 1 + (img_id % 2)
        # non-overlapping halves: one box per half when there are two
        for j in range(n_obj):
            w = int(rng.randint(18, 28))
            h = int(rng.randint(18, 28))
            if n_obj == 2:
                x0 = int(rng.randint(1, _SIZE // 2 - w - 1)) + (_SIZE // 2) * j
            else:
                x0 = int(rng.randint(1, _SIZE - w - 1))
            y0 = int(rng.randint(1, _SIZE - h - 1))
            cat = int(rng.randint(0, 3))
            img[y0 : y0 + h, x0 : x0 + w] = _COLORS[cat]
            x1, y1 = x0 + w, y0 + h
            ann = {
                "id": ann_id,
                "image_id": img_id,
                "category_id": cat + 1,
                "bbox": [x0, y0, w, h],
                "area": w * h,
                "iscrowd": 0,
                "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
            }
            if keypoints:
                corners = [
                    (x0 + 2, y0 + 2),
                    (x1 - 2, y0 + 2),
                    (x1 - 2, y1 - 2),
                    (x0 + 2, y1 - 2),
                ]
                ann["keypoints"] = [v for (kx, ky) in corners for v in (kx, ky, 2)]
                ann["num_keypoints"] = 4
            annotations.append(ann)
            ann_id += 1
        fname = f"synth_{img_id:03d}.png"
        Image.fromarray(img).save(os.path.join(img_dir, fname))
        images.append({"id": img_id, "file_name": fname, "height": _SIZE, "width": _SIZE})

    categories = [{"id": i + 1, "name": n} for i, n in enumerate(["red", "green", "blue"])]
    if keypoints:
        for c in categories:
            c["keypoints"] = ["tl", "tr", "br", "bl"]
    coco = {"images": images, "annotations": annotations, "categories": categories}
    json_file = os.path.join(root, "synth.json")
    with open(json_file, "w") as f:
        json.dump(coco, f)
    return json_file, img_dir


def _overfit_cfg(out_dir: str):
    from __graft_entry__ import _dryrun_cfg

    cfg = _dryrun_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU
    cfg.TPU.MESH_DATA = -1  # all 8 virtual devices, 1 image each
    cfg.TPU.MAX_GT_INSTANCES = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.5
    cfg.DATASETS.TRAIN = ("synth_overfit",)
    cfg.DATASETS.TEST = ("synth_overfit",)
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (_SIZE,)
    cfg.INPUT.MAX_SIZE_TRAIN = _SIZE
    cfg.INPUT.MIN_SIZE_TEST = _SIZE
    cfg.INPUT.MAX_SIZE_TEST = _SIZE
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.MAX_ITER = 500
    cfg.SOLVER.STEPS = (400,)
    cfg.SOLVER.CHECKPOINT_PERIOD = 10_000  # final checkpoint only
    cfg.TEST.EVAL_PERIOD = 0  # evaluate once, after the last iteration
    # the metric gate (reference *_training_acc_test.yaml gates +-1.0 on real
    # COCO): band measured over 5 seeded runs of this loop on 2026-08-20 —
    # bbox AP in [96.2, 97.9], segm AP in [85.6, 89.2] — gated at ~2x the
    # observed spread so seed noise passes but a real train->eval regression
    # (sampling, loss, NMS, paste, evaluator) fails
    cfg.TEST.EXPECTED_RESULTS = [
        ["bbox", "AP", 96.0, 6.0],
        ["segm", "AP", 87.0, 8.0],
    ]
    cfg.OUTPUT_DIR = out_dir
    return cfg


def test_training_acc_synthetic_coco(tmp_path):
    from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from detectron2_tpu.data.datasets import register_coco_instances
    from detectron2_tpu.engine import DefaultTrainer
    from detectron2_tpu.evaluation import COCOEvaluator

    json_file, img_dir = _make_synthetic_coco(str(tmp_path))
    name = "synth_overfit"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_coco_instances(name, {}, json_file, img_dir)

    class Trainer(DefaultTrainer):
        # the reference's tools/train_net.py Trainer pattern
        @classmethod
        def build_evaluator(cls, cfg, dataset_name):
            return COCOEvaluator(
                dataset_name, output_dir=os.path.join(cfg.OUTPUT_DIR, "eval"), distributed=False
            )

    cfg = _overfit_cfg(str(tmp_path / "output"))
    trainer = Trainer(cfg)
    results = trainer.train()  # runs verify_results (sys.exit(1) on failure)

    assert results is not None and "bbox" in results and "segm" in results
    bbox_ap, segm_ap = results["bbox"]["AP"], results["segm"]["AP"]
    assert np.isfinite(bbox_ap) and np.isfinite(segm_ap)
    # verify_results already gated these; keep explicit floors in the assert
    # message for debuggability (gate band: bbox 96+-6, segm 87+-8)
    assert bbox_ap >= 90.0, f"bbox AP {bbox_ap}"
    assert segm_ap >= 79.0, f"segm AP {segm_ap}"


def test_training_acc_synthetic_keypoints(tmp_path):
    """Second head family through the same closed loop: Keypoint R-CNN on
    rectangle corners (4 keypoints), gated through EvalHook ->
    COCOEvaluator keypoint AP with custom OKS sigmas — the analogue of the
    reference's keypoint_rcnn_R_50_FPN_training_acc_test.yaml."""
    from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from detectron2_tpu.data.datasets import register_coco_instances
    from detectron2_tpu.engine import DefaultTrainer
    from detectron2_tpu.evaluation import COCOEvaluator

    json_file, img_dir = _make_synthetic_coco(str(tmp_path), keypoints=True)
    name = "synth_overfit_kp"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_coco_instances(name, {}, json_file, img_dir)
    # corner keypoints have no left/right twins; empty flip map, but flips
    # are disabled below anyway (a horizontal flip maps tl->tr which an
    # empty flip map cannot express)
    # tuples: load_coco_json later sets keypoint_names from the json as a
    # tuple and Metadata's consistency assert compares with == (list != tuple)
    MetadataCatalog.get(name).set(keypoint_names=("tl", "tr", "br", "bl"), keypoint_flip_map=())

    class Trainer(DefaultTrainer):
        @classmethod
        def build_evaluator(cls, cfg, dataset_name):
            return COCOEvaluator(
                dataset_name,
                output_dir=os.path.join(cfg.OUTPUT_DIR, "eval"),
                distributed=False,
                kpt_oks_sigmas=cfg.TEST.KEYPOINT_OKS_SIGMAS,
            )

    cfg = _overfit_cfg(str(tmp_path / "output_kp"))
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 4
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (32, 32)
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.TEST.KEYPOINT_OKS_SIGMAS = [0.1, 0.1, 0.1, 0.1]
    cfg.TEST.EXPECTED_RESULTS = [
        ["bbox", "AP", 75.0, 25.0],
        ["keypoints", "AP", 60.0, 40.0],
    ]
    trainer = Trainer(cfg)
    results = trainer.train()

    assert results is not None and "bbox" in results and "keypoints" in results
    kp_ap = results["keypoints"]["AP"]
    assert np.isfinite(kp_ap)
    assert kp_ap >= 20.0, f"keypoint AP {kp_ap}"
