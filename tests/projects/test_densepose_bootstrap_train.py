"""DensePose bootstrap TRAINING integration: CombinedDataLoader mixing,
ImageListDataset, cfg-driven sampler/filter/loader builders, pseudo-label ->
padded-batch conversion, and the combined train loader end to end with a fake
predictor (reference projects/DensePose/densepose/data/combined_loader.py,
data/build.py:503-738, data/image_list_dataset.py, engine/trainer.py:224-239).
"""

import os

import numpy as np
import pytest

from detectron2_tpu.config import get_cfg
from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_tpu.projects.densepose import (
    CombinedDataLoader,
    DatasetType,
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    ImageListDataset,
    ImageResizeTransform,
    ScoreBasedFilter,
    add_densepose_config,
    build_combined_train_loader,
    build_data_filter,
    build_data_sampler,
    build_inference_based_loader,
    get_bootstrap_dataset_config,
    load_bootstrap_config,
    pseudo_to_train_sample,
)
from detectron2_tpu.projects.densepose.bootstrap import PredictionToGroundTruthSampler
from detectron2_tpu.structures import Boxes, Instances

S = 32
IMG_H = IMG_W = 64
BOX_XYXY = np.array([10.0, 10.0, 42.0, 52.0], np.float32)


def _chart_maps():
    coarse = np.zeros((S, S, 2), np.float32)
    coarse[..., 1] = 5.0
    fine = np.zeros((S, S, 25), np.float32)
    fine[: S // 2, :, 1] = 5.0
    fine[S // 2 :, :, 23] = 5.0
    u = np.zeros((S, S, 25), np.float32)
    v = np.zeros((S, S, 25), np.float32)
    u[..., 1], v[..., 1] = 0.25, 0.75
    u[..., 23], v[..., 23] = 0.6, 0.1
    return {"coarse_segm": coarse, "fine_segm": fine, "u": u, "v": v}


def _fake_predict_fn(batch):
    """Stands in for the jitted bootstrap model: one high-score detection
    with synthetic chart maps per image."""
    out = []
    for d in batch:
        h, w = d["image"].shape[:2]
        inst = Instances((h, w))
        inst.pred_boxes = Boxes(BOX_XYXY[None].copy())
        inst.scores = np.asarray([0.95], np.float32)
        inst.pred_classes = np.zeros((1,), np.int64)
        inst.pred_densepose = [_chart_maps()]
        out.append({"instances": inst})
    return out


# --------------------------------------------------------------- components


def test_combined_loader_ratio_mixing_and_pooling():
    """Mixed batches draw from constituent loaders at the given ratios, and
    leftovers from pooled constituent batches are not dropped."""

    def make_loader(tag, inner_batch):
        def gen():
            i = 0
            while True:
                yield [f"{tag}{i + j}" for j in range(inner_batch)]
                i += inner_batch

        return gen()

    # inner batch sizes differ from the output batch size on purpose
    combined = CombinedDataLoader([make_loader("a", 3), make_loader("b", 5)], 4, [0.75, 0.25], seed=0)
    it = iter(combined)
    batches = [next(it) for _ in range(200)]
    flat = [s for b in batches for s in b]
    assert all(len(b) == 4 for b in batches)
    frac_a = sum(s.startswith("a") for s in flat) / len(flat)
    assert 0.70 < frac_a < 0.80, frac_a
    # per-loader streams arrive in order without drops (pooling works)
    a_seq = [int(s[1:]) for s in flat if s.startswith("a")]
    assert a_seq == list(range(len(a_seq)))


def test_combined_loader_is_deterministic_per_seed():
    def make_loader(tag):
        def gen():
            i = 0
            while True:
                yield [f"{tag}{i}"]
                i += 1

        return gen()

    def draw(seed):
        c = CombinedDataLoader([make_loader("a"), make_loader("b")], 3, [0.5, 0.5], seed=seed)
        it = iter(c)
        return [tuple(next(it)) for _ in range(20)]

    assert draw(7) == draw(7)
    assert draw(7) != draw(8)


def test_image_list_dataset_reader_and_failures():
    reads = []

    def reader(path):
        reads.append(path)
        if path == "bad.png":
            raise OSError("boom")
        return np.full((8, 6, 3), 7, np.uint8)

    ds = ImageListDataset(["x.png", "bad.png"], "person", image_reader=reader)
    assert len(ds) == 2
    d0 = ds[0]
    assert d0["images"].shape == (1, 8, 6, 3) and d0["images"].dtype == np.float32
    assert d0["categories"] == ["person"]
    d1 = ds[1]
    assert d1["images"].shape[0] == 0 and d1["categories"] == []
    assert reads == ["x.png", "bad.png"]


def test_image_resize_transform_aspect_and_range():
    t = ImageResizeTransform(min_size=20, max_size=33)
    out = t(np.zeros((2, 10, 40, 3), np.float32))
    # scale = min(20/10, 33/40) = 0.825 -> (8, 33)
    assert out.shape == (2, 8, 33, 3) and out.dtype == np.float32


def test_build_data_sampler_and_filter_from_cfg():
    cfg = get_cfg()
    add_densepose_config(cfg)
    node = get_bootstrap_dataset_config()
    node.DATA_SAMPLER.TYPE = "densepose_uniform"
    node.DATA_SAMPLER.COUNT_PER_CLASS = 5
    sampler = build_data_sampler(cfg, node.DATA_SAMPLER)
    assert isinstance(sampler, PredictionToGroundTruthSampler)
    dp = sampler._samplers[("pred_densepose", "gt_densepose")].func
    assert isinstance(dp, DensePoseUniformSampler) and dp.count_per_class == 5

    node.DATA_SAMPLER.TYPE = "densepose_UV_confidence"
    sampler = build_data_sampler(cfg, node.DATA_SAMPLER)
    dp = sampler._samplers[("pred_densepose", "gt_densepose")].func
    assert isinstance(dp, DensePoseConfidenceBasedSampler)
    assert dp.confidence_channel == "sigma_2" and dp.search_proportion == 0.5

    node.FILTER.TYPE = "detection_score"
    node.FILTER.MIN_VALUE = 0.7
    filt = build_data_filter(node.FILTER)
    assert isinstance(filt, ScoreBasedFilter) and filt.min_score == 0.7

    with pytest.raises(ValueError):
        node.DATA_SAMPLER.TYPE = "nope"
        build_data_sampler(cfg, node.DATA_SAMPLER)


def test_pseudo_to_train_sample_packs_points():
    """Sampled pseudo-labels round-trip into the padded gt_dp_* arrays in
    the absolute image frame."""
    sampler = PredictionToGroundTruthSampler("synth_bootstrap")
    sampler.register_sampler(
        "pred_densepose", "gt_densepose", DensePoseUniformSampler(count_per_class=4, seed=0)
    )
    image = np.zeros((IMG_H, IMG_W, 3), np.float32)
    model_output = _fake_predict_fn([{"image": image, "category": "person"}])
    for o in model_output:
        o["image"] = image
    sampler(model_output)

    sample = pseudo_to_train_sample(model_output[0])
    inst = sample["instances"]
    assert sample["dataset"] == "synth_bootstrap"
    assert inst.has("gt_boxes") and inst.has("gt_classes")
    np.testing.assert_allclose(np.asarray(inst.gt_boxes.tensor)[0], BOX_XYXY)
    part = inst.gt_dp_part[0]
    pts = inst.gt_dp_points[0]
    n_pts = int((part >= 0).sum())
    assert n_pts == 8  # 2 parts x 4 points
    # absolute points land inside the box
    valid = part >= 0
    assert np.all(pts[valid, 0] >= BOX_XYXY[0]) and np.all(pts[valid, 0] <= BOX_XYXY[2])
    assert np.all(pts[valid, 1] >= BOX_XYXY[1]) and np.all(pts[valid, 1] <= BOX_XYXY[3])
    # u constants survive
    u = inst.gt_dp_u[0]
    np.testing.assert_allclose(u[part == 1], 0.25, atol=1e-5)
    np.testing.assert_allclose(u[part == 23], 0.6, atol=1e-5)


# --------------------------------------------------------------- pipelines


def _write_image_list_dataset(tmp_path, name, n=4):
    """Register an IMAGE_LIST bootstrap dataset over real PNG files."""
    import cv2

    img_dir = tmp_path / "boot_images"
    img_dir.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        p = str(img_dir / f"im_{i}.png")
        cv2.imwrite(p, np.full((IMG_H, IMG_W, 3), 30 + i, np.uint8))
        paths.append(f"im_{i}.png")
    list_fpath = str(tmp_path / "image_list.txt")
    with open(list_fpath, "w") as f:
        f.write("\n".join(paths) + "\n")
    if name not in DatasetCatalog:
        DatasetCatalog.register(name, lambda: [])
    MetadataCatalog.get(name).set(
        dataset_type=DatasetType.IMAGE_LIST,
        image_list_fpath=list_fpath,
        image_base_path=str(img_dir),
        category="person",
    )


def _bootstrap_entry(dataset_name):
    return {
        "DATASET": dataset_name,
        "RATIO": 1.0,
        "IMAGE_LOADER": {
            "TYPE": "image_list",
            "BATCH_SIZE": 2,
            "CATEGORIES": ["person"],
            "CATEGORY_TO_CLASS_MAPPING": {"person": 0},
            "TRANSFORM": {"TYPE": "resize", "MIN_SIZE": IMG_H, "MAX_SIZE": IMG_W},
        },
        "INFERENCE": {"INPUT_BATCH_SIZE": 2, "OUTPUT_BATCH_SIZE": 2},
        "DATA_SAMPLER": {"TYPE": "densepose_uniform", "COUNT_PER_CLASS": 3},
        "FILTER": {"TYPE": "detection_score", "MIN_VALUE": 0.8},
    }


def test_inference_based_loader_from_cfg(tmp_path):
    """build_inference_based_loader over a real IMAGE_LIST dataset with a
    fake predictor yields pseudo-labeled prediction-format samples."""
    cfg = get_cfg()
    add_densepose_config(cfg)
    _write_image_list_dataset(tmp_path, "synth_bootstrap_images")
    cfg.BOOTSTRAP_DATASETS = [_bootstrap_entry("synth_bootstrap_images")]
    load_bootstrap_config(cfg)

    loader = build_inference_based_loader(cfg, cfg.BOOTSTRAP_DATASETS[0], _fake_predict_fn)
    batch = next(iter(loader))
    assert 0 < len(batch) <= 2
    for sample in batch:
        inst = sample["instances"]
        assert inst.has("gt_densepose") and inst.has("gt_boxes") and inst.has("gt_masks")
        assert not inst.has("scores")  # PredictionToGroundTruthSampler deletes scores
        assert sample["image"].shape == (IMG_H, IMG_W, 3)
        assert np.asarray(inst.dataset_classes).tolist() == [0]


def test_combined_train_loader_end_to_end(tmp_path):
    """gt + bootstrap streams mix into fixed-shape padded batches with
    gt_dp_* targets regardless of which stream a sample came from."""
    import json

    from PIL import Image

    # --- tiny DensePose-COCO gt dataset (2 images, 1 person each)
    img_dir = tmp_path / "gt_images"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(1, 3):
        fname = f"gt_{i}.png"
        Image.fromarray(np.full((IMG_H, IMG_W, 3), 90, np.uint8)).save(str(img_dir / fname))
        images.append({"id": i, "file_name": fname, "height": IMG_H, "width": IMG_W})
        annotations.append(
            {
                "id": i,
                "image_id": i,
                "category_id": 1,
                "bbox": [10, 10, 32, 42],
                "area": 32 * 42,
                "iscrowd": 0,
                "dp_x": [10.0, 128.0],
                "dp_y": [20.0, 200.0],
                "dp_I": [1, 23],
                "dp_U": [0.3, 0.6],
                "dp_V": [0.7, 0.2],
            }
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    json_file = str(tmp_path / "dp_synth.json")
    with open(json_file, "w") as f:
        json.dump(coco, f)

    from detectron2_tpu.data.datasets.coco import load_coco_json

    name = "synth_dp_gt_train"
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name,
            lambda: load_coco_json(
                json_file, str(img_dir), name, extra_annotation_keys=["dp_x", "dp_y", "dp_I", "dp_U", "dp_V"]
            ),
        )
    MetadataCatalog.get(name).set(json_file=json_file, image_root=str(img_dir), thing_classes=["person"])

    _write_image_list_dataset(tmp_path, "synth_bootstrap_images2")

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS = False
    cfg.INPUT.MIN_SIZE_TRAIN = (IMG_H,)
    cfg.INPUT.MAX_SIZE_TRAIN = IMG_W
    cfg.TPU.MAX_GT_INSTANCES = 4
    cfg.BOOTSTRAP_DATASETS = [_bootstrap_entry("synth_bootstrap_images2")]
    load_bootstrap_config(cfg)

    tagged = []

    class Tagger:
        def __init__(self, loader):
            self.loader = loader

        def __iter__(self):
            for batch in self.loader:
                tagged.append([s.get("dataset", "gt") for s in batch])
                yield batch

    loader = build_combined_train_loader(cfg, _fake_predict_fn, seed=3, wrap=Tagger)
    it = iter(loader)
    batches = [next(it) for _ in range(6)]
    for out in batches:
        assert out["image"].shape == (4, IMG_H, IMG_W, 3)
        assert out["gt_dp_points"].shape[:2] == (4, 4)
        assert out["gt_dp_part"].shape == out["gt_dp_u"].shape == out["gt_dp_v"].shape
        # every image with any point supervision keeps labels in [1, 24]
        parts = out["gt_dp_part"]
        assert parts.max() <= 24 and parts[parts >= 0].size > 0
    # both streams contributed within the first few mixed batches
    seen = {t for b in tagged for t in b}
    assert "gt" in seen and "synth_bootstrap_images2" in seen


def test_bootstrap_trainer_end_to_end(tmp_path, monkeypatch):
    """The full bootstrap RECIPE once: Trainer.build_train_loader composes
    build_combined_train_loader (gt + pseudo-label streams) behind
    SampleCountingLoader, and DefaultTrainer drives N SPMD steps on the mixed
    batches — finite losses, and the per-dataset batch/<name> counters in the
    event storage prove BOTH streams actually reached compiled train steps
    (reference densepose/engine/trainer.py:77-260). The pseudo-labeling
    predictor is the fake (its real jitted path is covered by
    build_bootstrap_predictor's own tests); compiling a second model here
    would only re-test that at 2x the wall clock.
    """
    import json

    from PIL import Image

    img_dir = tmp_path / "gt_images"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(1, 3):
        fname = f"gt_{i}.png"
        Image.fromarray(np.full((IMG_H, IMG_W, 3), 90, np.uint8)).save(str(img_dir / fname))
        images.append({"id": i, "file_name": fname, "height": IMG_H, "width": IMG_W})
        annotations.append(
            {
                "id": i,
                "image_id": i,
                "category_id": 1,
                "bbox": [10, 10, 32, 42],
                "area": 32 * 42,
                "iscrowd": 0,
                "dp_x": [10.0, 128.0],
                "dp_y": [20.0, 200.0],
                "dp_I": [1, 23],
                "dp_U": [0.3, 0.6],
                "dp_V": [0.7, 0.2],
            }
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    json_file = str(tmp_path / "dp_synth.json")
    with open(json_file, "w") as f:
        json.dump(coco, f)

    from detectron2_tpu.data.datasets.coco import load_coco_json

    name = "synth_dp_gt_trainer_e2e"
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name,
            lambda: load_coco_json(
                json_file,
                str(img_dir),
                name,
                extra_annotation_keys=["dp_x", "dp_y", "dp_I", "dp_U", "dp_V"],
            ),
        )
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=str(img_dir), thing_classes=["person"]
    )
    _write_image_list_dataset(tmp_path, "synth_bootstrap_trainer_imgs")

    # tiny DensePose R-CNN (one CPU-feasible compile)
    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.DENSEPOSE_ON = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_INSTANCES = 4
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS = False
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (IMG_H,)
    cfg.INPUT.MAX_SIZE_TRAIN = IMG_W
    cfg.SOLVER.IMS_PER_BATCH = 8  # the test mesh has 8 virtual CPU devices
    # random-init dp-head gradients reach ~4e3 on these tiny synthetic
    # batches: clip like the reference DensePose WC recipes do and keep the
    # LR small — the test gates wiring + finiteness, not convergence
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.MAX_ITER = 6
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.TEST.EVAL_PERIOD = 0
    cfg.SEED = 5
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.BOOTSTRAP_DATASETS = [_bootstrap_entry("synth_bootstrap_trainer_imgs")]
    load_bootstrap_config(cfg)
    cfg.freeze()

    from detectron2_tpu.projects.densepose import trainer as dp_trainer
    from detectron2_tpu.projects.densepose.build import has_inference_based_loaders

    # inject the fake pseudo-labeling predictor (signature of the real one)
    monkeypatch.setattr(
        dp_trainer, "build_bootstrap_predictor", lambda c, model=None, params=None: _fake_predict_fn
    )
    assert has_inference_based_loaders(cfg)
    trainer = dp_trainer.Trainer(cfg)
    trainer.train()

    # TrainerBase keeps the EventStorage handle after the `with` block exits
    histories = trainer.storage.histories()
    total = histories["total_loss"].values()
    assert len(total) >= cfg.SOLVER.MAX_ITER
    assert all(np.isfinite(v) for v, _ in total)
    # both streams reached compiled steps: SampleCountingLoader tallied them
    gt_counts = histories["batch/gt"].values()
    boot_counts = histories["batch/synth_bootstrap_trainer_imgs"].values()
    assert sum(v for v, _ in gt_counts) > 0
    assert sum(v for v, _ in boot_counts) > 0
