"""DensePose bootstrap training data pipeline: combined + inference-based
loaders wired into runnable training (reference
projects/DensePose/densepose/data/combined_loader.py:1-46,
data/build.py:428-738, data/image_list_dataset.py:1-74,
data/transform/image.py:1-39, data/datasets/dataset_type.py).

TPU re-design. The reference's model consumes a list of per-image dicts, so
its CombinedDataLoader mixes *model-ready* batches. Here the compiled train
step consumes ONE padded, fixed-shape batch dict, so mixing happens one level
earlier — at the sample-stream level — and a single
:class:`~detectron2_tpu.projects.densepose.dataset_mapper.DensePoseBatchCollator`
pads the mixed batch. The batch shape is therefore static no matter what the
gt/pseudo-label mix of a given step is: no recompiles when the bootstrap
ratio or the per-step draw changes.

Pseudo-labeled samples (from :class:`InferenceBasedLoader`) carry their GT in
``Instances`` fields (``gt_boxes`` / ``gt_classes`` / ``gt_densepose``
(:class:`DensePoseList`) / ``gt_masks``); :func:`pseudo_to_train_sample`
re-packs the sparse DensePose points into the padded ``gt_dp_*`` arrays the
collator stacks — the same packing the mapper applies to real annotations.
"""

import logging
from enum import Enum
from typing import Any, Callable, Collection, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_tpu.data.build import (
    PaddedBatchCollator,
    build_detection_train_loader,
    get_detection_dataset_dicts,
    trivial_batch_collator,
)
from detectron2_tpu.data.samplers import TrainingSampler
from detectron2_tpu.structures import Boxes, Instances

from .bootstrap import (
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    InferenceBasedLoader,
    MaskFromDensePoseSampler,
    PredictionToGroundTruthSampler,
    ScoreBasedFilter,
)
from .dataset_mapper import DP_MAX_POINTS, DensePoseBatchCollator, DensePoseDatasetMapper
from .structures import DensePoseDataRelative
from .video import (
    FrameSelectionStrategy,
    VideoKeyframeDataset,
    frame_selector_from_strategy,
    maybe_prepend_base_path,
    video_list_from_file,
)

__all__ = [
    "DatasetType",
    "ImageResizeTransform",
    "ImageListDataset",
    "CombinedDataLoader",
    "BootstrapDatasetFactoryCatalog",
    "build_frame_selector",
    "build_transform",
    "build_combined_loader",
    "build_bootstrap_dataset",
    "build_data_sampler",
    "build_data_filter",
    "build_inference_based_loader",
    "build_inference_based_loaders",
    "has_inference_based_loaders",
    "build_video_list_dataset",
    "build_image_list_dataset",
    "build_combined_train_loader",
    "pseudo_to_train_sample",
    "pack_densepose_points",
    "get_category_to_class_mapping",
    "get_class_to_mesh_name_mapping",
]

logger = logging.getLogger(__name__)


class DatasetType(Enum):
    """Bootstrap dataset kinds (reference datasets/dataset_type.py:8-13;
    IMAGE_LIST added — the reference ships ImageListDataset without wiring
    it into the factory catalog)."""

    VIDEO_LIST = "video_list"
    IMAGE_LIST = "image_list"


class ImageResizeTransform:
    """Resize loaded image batches to the DensePose training range
    (reference data/transform/image.py:8-39). NHWC float32 BGR in and out
    (the reference is NCHW torch); bilinear, aspect preserved."""

    def __init__(self, min_size: int = 800, max_size: int = 1333):
        self.min_size = min_size
        self.max_size = max_size

    def __call__(self, images: np.ndarray) -> np.ndarray:
        import cv2

        images = np.asarray(images, np.float32)
        h, w = images.shape[1:3]
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        nh, nw = int(h * scale), int(w * scale)
        return np.stack(
            [cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR) for im in images]
        ).reshape(len(images), nh, nw, images.shape[3])


class ImageListDataset:
    """Images from a list of paths (reference image_list_dataset.py:17-74).

    Yields {"images": float32 [N, H, W, 3] BGR (NHWC — TPU layout; the
    reference yields NCHW torch), "categories": List[str]}; N = 1, or 0 on a
    read failure. ``image_reader`` is injectable so the pipeline is testable
    without image files on disk."""

    _EMPTY_IMAGE = np.empty((0, 1, 1, 3), dtype=np.float32)

    def __init__(
        self,
        image_list: List[str],
        category_list=None,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        image_reader: Optional[Callable[[str], np.ndarray]] = None,
    ):
        if isinstance(category_list, list):
            self.category_list = category_list
        else:
            self.category_list = [category_list] * len(image_list)
        assert len(image_list) == len(
            self.category_list
        ), "length of image and category lists must be equal"
        self.image_list = image_list
        self.transform = transform
        self.image_reader = image_reader or self._read_bgr

    @staticmethod
    def _read_bgr(fpath: str) -> np.ndarray:
        from detectron2_tpu.data.detection_utils import read_image

        return np.ascontiguousarray(read_image(fpath, format="BGR"))

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        fpath = self.image_list[idx]
        try:
            image = np.asarray(self.image_reader(fpath), np.float32)[None]  # [1, H, W, 3]
            if self.transform is not None:
                image = self.transform(image)
            return {"images": image, "categories": [self.category_list[idx]]}
        except (OSError, RuntimeError) as e:
            logger.warning(f"Error opening image file container {fpath}: {e}")
        return {"images": self._EMPTY_IMAGE, "categories": []}

    def __len__(self):
        return len(self.image_list)


class CombinedDataLoader:
    """Mix several sample-batch loaders with given sampling ratios
    (reference combined_loader.py:18-46).

    Each constituent loader yields *lists of samples*; this draws a loader
    index per output slot (seeded numpy RNG — the reference uses the global
    ``random``, unseedable per-loader) and pools leftovers so no sample is
    dropped. Infinite as long as every constituent is."""

    BATCH_COUNT = 100

    def __init__(
        self,
        loaders: Collection[Iterable[List[Any]]],
        batch_size: int,
        ratios: Sequence[float],
        seed: Optional[int] = None,
    ):
        self.loaders = loaders
        self.batch_size = batch_size
        self.ratios = np.asarray(ratios, np.float64) / float(np.sum(ratios))
        self._rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[List[Any]]:
        from collections import deque

        iters = [iter(loader) for loader in self.loaders]
        pools = [deque() for _ in iters]
        indices: List[int] = []

        def pooled_next(i):
            if not pools[i]:
                pools[i].extend(next(iters[i]))
            return pools[i].popleft()

        while True:
            if not indices:
                k = self.batch_size * self.BATCH_COUNT
                indices = self._rng.choice(len(iters), size=k, p=self.ratios).tolist()
            try:
                batch = [pooled_next(i) for i in indices[: self.batch_size]]
            except StopIteration:
                return
            indices = indices[self.batch_size :]
            yield batch


def pack_densepose_points(
    dp_datas: Sequence[Optional[DensePoseDataRelative]],
    boxes_xyxy: np.ndarray,
    max_points: int = DP_MAX_POINTS,
) -> Dict[str, np.ndarray]:
    """Sparse per-instance DensePose points -> the padded ``gt_dp_*`` arrays
    the compiled loss consumes (box-relative [0, 256) -> absolute xy; see
    DensePoseDatasetMapper). Shared by the mapper (real annotations) and
    :func:`pseudo_to_train_sample` (sampled pseudo-labels)."""
    G = len(dp_datas)
    P = max_points
    pts = np.zeros((G, P, 2), np.float32)
    part = np.full((G, P), -1, np.int64)
    u = np.zeros((G, P), np.float32)
    v = np.zeros((G, P), np.float32)
    boxes = np.asarray(boxes_xyxy, np.float64).reshape(-1, 4)
    for g, dp in enumerate(dp_datas):
        if dp is None or not hasattr(dp, "i") or dp.i is None or len(dp.i) == 0:
            continue
        n = min(len(dp.x), P)
        x0, y0, x1, y1 = boxes[g]
        w = max(x1 - x0, 1e-4)
        h = max(y1 - y0, 1e-4)
        pts[g, :n, 0] = x0 + dp.x[:n] * w / DensePoseDataRelative.MASK_SIZE
        pts[g, :n, 1] = y0 + dp.y[:n] * h / DensePoseDataRelative.MASK_SIZE
        part[g, :n] = dp.i[:n]
        u[g, :n] = np.clip(dp.u[:n], 0.0, 1.0)
        v[g, :n] = np.clip(dp.v[:n], 0.0, 1.0)
    return {"gt_dp_points": pts, "gt_dp_part": part, "gt_dp_u": u, "gt_dp_v": v}


def pseudo_to_train_sample(sample: Dict[str, Any], max_points: int = DP_MAX_POINTS) -> Dict[str, Any]:
    """One InferenceBasedLoader output -> a mapper-format training sample the
    DensePoseBatchCollator can pad (image stays as-is; the sampled
    DensePoseList is re-packed into the ``gt_dp_*`` point arrays)."""
    instances: Instances = sample["instances"]
    out: Dict[str, Any] = {"image": np.asarray(sample["image"], np.float32)}
    if "dataset" in sample:
        out["dataset"] = sample["dataset"]
    G = len(instances)
    new = Instances(instances.image_size)
    boxes = instances.gt_boxes if instances.has("gt_boxes") else Boxes(np.zeros((0, 4)))
    if not isinstance(boxes, Boxes):
        boxes = Boxes(np.asarray(boxes, np.float32).reshape(-1, 4))
    new.gt_boxes = boxes
    new.gt_classes = (
        np.asarray(instances.gt_classes, np.int64)
        if instances.has("gt_classes")
        else np.zeros((G,), np.int64)
    )
    if instances.has("gt_masks"):
        new.gt_masks = instances.gt_masks
    dp_datas: List[Optional[DensePoseDataRelative]] = [None] * G
    if instances.has("gt_densepose"):
        dp_list = instances.gt_densepose
        dp_datas = [dp_list[i] for i in range(len(dp_list))] + [None] * (G - len(dp_list))
    packed = pack_densepose_points(dp_datas[:G], boxes.tensor, max_points)
    for k, arr in packed.items():
        new.set(k, arr)
    out["instances"] = new
    return out


class _PseudoLabelSampleLoader:
    """Adapts an InferenceBasedLoader (yields lists of prediction-format
    samples) into the mapper-format sample batches CombinedDataLoader mixes."""

    def __init__(self, inference_loader: InferenceBasedLoader, max_points: int = DP_MAX_POINTS):
        self.inference_loader = inference_loader
        self.max_points = max_points

    def __iter__(self):
        for batch in self.inference_loader:
            out = [pseudo_to_train_sample(s, self.max_points) for s in batch]
            if out:
                yield out


# ---------------------------------------------------------------------------
# config-driven builders (reference data/build.py:503-738)
# ---------------------------------------------------------------------------


def get_class_to_mesh_name_mapping(cfg) -> Dict[int, str]:
    """(reference data/utils.py:29-33)."""
    return {
        int(class_id): mesh_name
        for class_id, mesh_name in cfg.DATASETS.CLASS_TO_MESH_NAME_MAPPING.items()
    }


def get_category_to_class_mapping(dataset_cfg) -> Dict[str, int]:
    """(reference data/utils.py:36-40)."""
    return {
        category: int(class_id)
        for category, class_id in dataset_cfg.CATEGORY_TO_CLASS_MAPPING.items()
    }


def build_frame_selector(cfg):
    """(reference data/build.py:503-514)."""
    strategy = FrameSelectionStrategy(cfg.STRATEGY)
    if strategy == FrameSelectionStrategy.ALL:
        return None
    return frame_selector_from_strategy(strategy, cfg.NUM_IMAGES)


def build_transform(cfg, data_type: str):
    """(reference data/build.py:517-521)."""
    if cfg.TYPE == "resize" and data_type == "image":
        return ImageResizeTransform(cfg.MIN_SIZE, cfg.MAX_SIZE)
    raise ValueError(f"Unknown transform {cfg.TYPE} for data type {data_type}")


def build_combined_loader(cfg, loaders, ratios, seed: Optional[int] = None):
    """(reference data/build.py:524-526). batch_size is the per-process
    share of SOLVER.IMS_PER_BATCH."""
    from detectron2_tpu.utils import comm

    images_per_worker = cfg.SOLVER.IMS_PER_BATCH // comm.get_world_size()
    return CombinedDataLoader(loaders, images_per_worker, ratios, seed=seed)


def build_video_list_dataset(meta, cfg):
    """(reference data/build.py:706-717)."""
    if cfg.TYPE != "video_keyframe":
        return None
    frame_selector = build_frame_selector(cfg.SELECT)
    transform = build_transform(cfg.TRANSFORM, data_type="image")
    video_list = video_list_from_file(meta.video_list_fpath, meta.video_base_path)
    keyframe_helper_fpath = getattr(cfg, "KEYFRAME_HELPER", None) or None
    return VideoKeyframeDataset(
        video_list, meta.category, frame_selector, transform, keyframe_helper_fpath
    )


def build_image_list_dataset(meta, cfg):
    """IMAGE_LIST factory: an image-path list file (one path per line,
    relative paths resolved against ``meta.image_base_path``)."""
    if cfg.TYPE != "image_list":
        return None
    transform = build_transform(cfg.TRANSFORM, data_type="image")
    base = getattr(meta, "image_base_path", None)
    with open(meta.image_list_fpath) as f:
        image_list = [maybe_prepend_base_path(base, line.strip()) for line in f if line.strip()]
    return ImageListDataset(image_list, getattr(meta, "category", None), transform)


class _BootstrapDatasetFactoryCatalog(dict):
    """DatasetType -> dataset factory registry (reference build.py:720-735)."""

    def register(self, dataset_type: DatasetType, factory: Callable[..., Any]):
        assert dataset_type not in self, f"Dataset '{dataset_type}' is already registered!"
        self[dataset_type] = factory


BootstrapDatasetFactoryCatalog = _BootstrapDatasetFactoryCatalog()
BootstrapDatasetFactoryCatalog.register(DatasetType.VIDEO_LIST, build_video_list_dataset)
BootstrapDatasetFactoryCatalog.register(DatasetType.IMAGE_LIST, build_image_list_dataset)


def _add_category_info_to_bootstrapping_metadata(dataset_name: str, dataset_cfg) -> None:
    """(reference data/build.py:296-306)."""
    meta = MetadataCatalog.get(dataset_name)
    meta.category_to_class_mapping = get_category_to_class_mapping(dataset_cfg)
    meta.categories = dataset_cfg.CATEGORIES
    meta.max_count_per_category = dataset_cfg.MAX_COUNT_PER_CATEGORY


def build_bootstrap_dataset(dataset_name: str, cfg):
    """(reference data/build.py:529-551). ``cfg`` is the IMAGE_LOADER node."""
    _add_category_info_to_bootstrapping_metadata(dataset_name, cfg)
    meta = MetadataCatalog.get(dataset_name)
    factory = BootstrapDatasetFactoryCatalog.get(meta.dataset_type)
    dataset = factory(meta, cfg) if factory is not None else None
    if dataset is None:
        logger.warning(f"Failed to create dataset {dataset_name} of type {meta.dataset_type}")
    return dataset


def build_data_sampler(cfg, sampler_cfg, embedder=None):
    """(reference data/build.py:553-641). The CSE samplers need the vertex
    embedder; chart samplers ignore it."""
    seed = max(getattr(cfg, "SEED", 0), 0) or None
    if sampler_cfg.TYPE == "densepose_uniform":
        data_sampler = PredictionToGroundTruthSampler()
        data_sampler.register_sampler(
            "pred_densepose",
            "gt_densepose",
            DensePoseUniformSampler(count_per_class=sampler_cfg.COUNT_PER_CLASS, seed=seed),
        )
        data_sampler.register_sampler("pred_densepose", "gt_masks", MaskFromDensePoseSampler())
        return data_sampler
    confidence_channels = {
        "densepose_UV_confidence": "sigma_2",
        "densepose_fine_segm_confidence": "fine_segm_confidence",
        "densepose_coarse_segm_confidence": "coarse_segm_confidence",
    }
    if sampler_cfg.TYPE in confidence_channels:
        data_sampler = PredictionToGroundTruthSampler()
        data_sampler.register_sampler(
            "pred_densepose",
            "gt_densepose",
            DensePoseConfidenceBasedSampler(
                confidence_channel=confidence_channels[sampler_cfg.TYPE],
                count_per_class=sampler_cfg.COUNT_PER_CLASS,
                search_proportion=0.5,
                seed=seed,
            ),
        )
        data_sampler.register_sampler("pred_densepose", "gt_masks", MaskFromDensePoseSampler())
        return data_sampler
    raise ValueError(f"Unknown data sampler type {sampler_cfg.TYPE}")


def build_data_filter(cfg):
    """(reference data/build.py:644-648)."""
    if cfg.TYPE == "detection_score":
        return ScoreBasedFilter(min_score=cfg.MIN_VALUE)
    raise ValueError(f"Unknown data filter type {cfg.TYPE}")


class _BootstrapImageBatchLoader:
    """Infinite loader over a bootstrap dataset yielding lists of
    {"images", "categories"} elements — the host-side stand-in for the
    reference's torch DataLoader + TrainingSampler (build.py:665-673)."""

    def __init__(self, dataset, batch_size: int, seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = TrainingSampler(len(dataset), seed=seed)

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(self.dataset[idx])
            if len(batch) == self.batch_size:
                yield batch
                batch = []


def build_inference_based_loader(
    cfg,
    dataset_cfg,
    predict_fn: Callable[[List[Dict[str, Any]]], List[Dict[str, Any]]],
    embedder=None,
) -> InferenceBasedLoader:
    """Data loader based on inference results of a model (reference
    data/build.py:651-680). ``predict_fn`` replaces the reference's torch
    model: a callable from per-image dicts to {"instances": Instances} (in
    practice a jitted apply + host postprocess — see
    ``trainer.build_bootstrap_predictor``)."""
    dataset = build_bootstrap_dataset(dataset_cfg.DATASET, dataset_cfg.IMAGE_LOADER)
    assert dataset is not None, f"could not build bootstrap dataset {dataset_cfg.DATASET}"
    meta = MetadataCatalog.get(dataset_cfg.DATASET)
    seed = max(getattr(cfg, "SEED", 0), 0) or None
    data_loader = _BootstrapImageBatchLoader(
        dataset, dataset_cfg.IMAGE_LOADER.BATCH_SIZE, seed=seed
    )
    data_sampler = build_data_sampler(cfg, dataset_cfg.DATA_SAMPLER, embedder)
    # stamp the source dataset on emitted samples (the reference leaves the
    # PredictionToGroundTruthSampler name empty; SampleCountingLoader and the
    # mixed-batch diagnostics are only useful with it set)
    if hasattr(data_sampler, "dataset_name"):
        data_sampler.dataset_name = dataset_cfg.DATASET
    return InferenceBasedLoader(
        predict_fn,
        data_loader=data_loader,
        data_sampler=data_sampler,
        data_filter=build_data_filter(dataset_cfg.FILTER),
        shuffle=True,
        batch_size=dataset_cfg.INFERENCE.OUTPUT_BATCH_SIZE,
        inference_batch_size=dataset_cfg.INFERENCE.INPUT_BATCH_SIZE,
        category_to_class_mapping=meta.category_to_class_mapping,
        seed=seed,
    )


def has_inference_based_loaders(cfg) -> bool:
    """(reference data/build.py:683-688)."""
    return len(cfg.BOOTSTRAP_DATASETS) > 0


def build_inference_based_loaders(
    cfg, predict_fn, embedder=None
) -> Tuple[List[InferenceBasedLoader], List[float]]:
    """(reference data/build.py:691-703)."""
    from .config import get_bootstrap_dataset_config

    loaders = []
    ratios = []
    for dataset_spec in cfg.BOOTSTRAP_DATASETS:
        dataset_cfg = get_bootstrap_dataset_config().clone()
        dataset_cfg.merge_from_other_cfg(type(dataset_cfg)(dataset_spec))
        loaders.append(build_inference_based_loader(cfg, dataset_cfg, predict_fn, embedder))
        ratios.append(dataset_cfg.RATIO)
    return loaders, ratios


def build_combined_train_loader(
    cfg,
    predict_fn,
    mapper=None,
    seed: Optional[int] = None,
    wrap: Optional[Callable[[Iterable], Iterable]] = None,
):
    """The bootstrap training loader: gt samples + pseudo-labeled samples,
    ratio-mixed, padded by one DensePoseBatchCollator (reference
    engine/trainer.py:224-239 build_train_loader).

    Yields the same fixed-shape batch dicts as the plain train loader — the
    compiled train step cannot tell the difference."""
    dataset = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
    )
    if mapper is None:
        mapper = DensePoseDatasetMapper(cfg, True)
    # gt stream: mapper-format sample batches (collation deferred to the end)
    gt_loader = build_detection_train_loader(
        dataset,
        mapper=mapper,
        total_batch_size=cfg.SOLVER.IMS_PER_BATCH,
        aspect_ratio_grouping=cfg.DATALOADER.ASPECT_RATIO_GROUPING,
        num_workers=0,
        collator=trivial_batch_collator,
    )
    loaders: List[Iterable] = [gt_loader]
    ratios: List[float] = [1.0]
    if has_inference_based_loaders(cfg):
        inference_loaders, inference_ratios = build_inference_based_loaders(cfg, predict_fn)
        loaders += [_PseudoLabelSampleLoader(l) for l in inference_loaders]
        ratios += inference_ratios
    combined = build_combined_loader(cfg, loaders, ratios, seed=seed)
    if wrap is not None:
        # e.g. trainer.SampleCountingLoader — must see the mixed samples
        # BEFORE collation erases their per-dataset identity
        combined = wrap(combined)
    collator = DensePoseBatchCollator(
        size_divisibility=32,
        size_bucket=cfg.TPU.SIZE_BUCKET,
        max_gt_instances=cfg.TPU.MAX_GT_INSTANCES,
        mask_size=2 * cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION if cfg.MODEL.MASK_ON else 0,
    )

    def _gen():
        for batch in combined:
            yield collator(batch)

    return _gen()
