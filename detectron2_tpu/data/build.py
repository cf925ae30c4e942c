"""Data loader builders producing fixed-shape padded batches.

Re-designs reference detectron2/data/build.py for the TPU batch contract:
instead of yielding a list of per-image dicts with variable-size tensors
(reference build_batch_data_loader :294), the train loader yields ONE dict of
stacked, padded arrays per step:

    {"image": [B, H, W, 3], "image_sizes": [B, 2], gt_* padded arrays,
     "metadata": list of per-image info for evaluators}

H, W are the batch max rounded up to the backbone's size_divisibility and the
``TPU.SIZE_BUCKET`` quantum, so the number of distinct compiled shapes stays
bounded (combined with aspect-ratio grouping).
"""

import itertools
import logging
import operator
from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np

from detectron2_tpu.config import configurable
from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.data.common import (
    AspectRatioGroupedDataset,
    DatasetFromList,
    MapDataset,
    ToIterableDataset,
)
from detectron2_tpu.data.dataset_mapper import DatasetMapper
from detectron2_tpu.data.detection_utils import check_metadata_consistency, instances_to_padded_targets
from detectron2_tpu.data.samplers import (
    InferenceSampler,
    RandomSubsetTrainingSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
)
from detectron2_tpu.utils import comm

logger = logging.getLogger(__name__)

__all__ = [
    "build_batch_data_loader",
    "build_detection_train_loader",
    "build_detection_test_loader",
    "get_detection_dataset_dicts",
    "load_proposals_into_dataset",
    "print_instances_class_histogram",
    "PaddedBatchCollator",
]


def filter_images_with_only_crowd_annotations(dataset_dicts: List[dict]) -> List[dict]:
    """Filter out images with none or crowd-only annotations
    (reference build.py:46)."""
    num_before = len(dataset_dicts)

    def valid(anns):
        for ann in anns:
            if ann.get("iscrowd", 0) == 0:
                return True
        return False

    dataset_dicts = [x for x in dataset_dicts if valid(x["annotations"])]
    num_after = len(dataset_dicts)
    logger.info(
        "Removed {} images with no usable annotations. {} images left.".format(
            num_before - num_after, num_after
        )
    )
    return dataset_dicts


def filter_images_with_few_keypoints(dataset_dicts: List[dict], min_keypoints_per_image: int) -> List[dict]:
    """Filter out images with too few keypoints (reference build.py:77)."""
    num_before = len(dataset_dicts)

    def visible_keypoints_in_image(dic):
        annotations = dic["annotations"]
        return sum(
            (np.array(ann["keypoints"][2::3]) > 0).sum()
            for ann in annotations
            if "keypoints" in ann
        )

    dataset_dicts = [
        x for x in dataset_dicts if visible_keypoints_in_image(x) >= min_keypoints_per_image
    ]
    num_after = len(dataset_dicts)
    logger.info(
        "Removed {} images with fewer than {} keypoints.".format(
            num_before - num_after, min_keypoints_per_image
        )
    )
    return dataset_dicts


def load_proposals_into_dataset(dataset_dicts: List[dict], proposal_file: str) -> List[dict]:
    """Load precomputed object proposals into the dataset (reference build.py:111)."""
    logger.info("Loading proposals from: {}".format(proposal_file))
    import pickle

    from detectron2_tpu.structures import BoxMode
    from detectron2_tpu.utils.file_io import PathManager

    with PathManager.open(proposal_file, "rb") as f:
        proposals = pickle.load(f, encoding="latin1")

    # rename the key names in D1 proposal files
    rename_keys = {"indexes": "ids", "scores": "objectness_logits"}
    for key in rename_keys:
        if key in proposals:
            proposals[rename_keys[key]] = proposals.pop(key)

    img_ids = set({str(record["image_id"]) for record in dataset_dicts})
    id_to_index = {str(id): i for i, id in enumerate(proposals["ids"]) if str(id) in img_ids}
    bbox_mode = BoxMode(proposals["bbox_mode"]) if "bbox_mode" in proposals else BoxMode.XYXY_ABS

    for record in dataset_dicts:
        i = id_to_index[str(record["image_id"])]
        boxes = proposals["boxes"][i]
        objectness_logits = proposals["objectness_logits"][i]
        inds = objectness_logits.argsort()[::-1]
        record["proposal_boxes"] = boxes[inds]
        record["proposal_objectness_logits"] = objectness_logits[inds]
        record["proposal_bbox_mode"] = bbox_mode
    return dataset_dicts


def print_instances_class_histogram(dataset_dicts: List[dict], class_names: List[str]) -> None:
    """Log a histogram of ground-truth classes (reference build.py:165)."""
    num_classes = len(class_names)
    histogram = np.zeros((num_classes,), dtype=int)
    for entry in dataset_dicts:
        annos = entry["annotations"]
        classes = np.asarray(
            [x["category_id"] for x in annos if not x.get("iscrowd", 0)], dtype=int
        )
        if len(classes):
            assert classes.min() >= 0 and classes.max() < num_classes
            histogram += np.histogram(classes, bins=num_classes, range=(0, num_classes))[0]
    total = int(histogram.sum())
    top = sorted(zip(class_names, histogram.tolist()), key=lambda x: -x[1])[:20]
    logger.info(
        f"Distribution of instances among all {num_classes} categories "
        f"(total {total}; top-{len(top)}): "
        + ", ".join(f"{n}: {c}" for n, c in top)
    )


def get_detection_dataset_dicts(
    names: Union[str, List[str]],
    filter_empty: bool = True,
    min_keypoints: int = 0,
    proposal_files=None,
    check_consistency: bool = True,
) -> List[dict]:
    """Load and prepare dataset dicts (reference build.py:217-291)."""
    if isinstance(names, str):
        names = [names]
    assert len(names), names
    dataset_dicts = [DatasetCatalog.get(dataset_name) for dataset_name in names]

    for dataset_name, dicts in zip(names, dataset_dicts):
        assert len(dicts), f"Dataset '{dataset_name}' is empty!"

    if proposal_files is not None:
        assert len(names) == len(proposal_files)
        dataset_dicts = [
            load_proposals_into_dataset(dataset_i_dicts, proposal_file)
            for dataset_i_dicts, proposal_file in zip(dataset_dicts, proposal_files)
        ]

    dataset_dicts = list(itertools.chain.from_iterable(dataset_dicts))

    has_instances = "annotations" in dataset_dicts[0]
    if filter_empty and has_instances:
        dataset_dicts = filter_images_with_only_crowd_annotations(dataset_dicts)
    if min_keypoints > 0 and has_instances:
        dataset_dicts = filter_images_with_few_keypoints(dataset_dicts, min_keypoints)

    if check_consistency and has_instances:
        try:
            class_names = MetadataCatalog.get(names[0]).thing_classes
            check_metadata_consistency("thing_classes", names)
            print_instances_class_histogram(dataset_dicts, class_names)
        except AttributeError:  # class names are not available for this dataset
            pass

    assert len(dataset_dicts), f"No valid data found in {','.join(names)}."
    return dataset_dicts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if m > 1 else x


class PaddedBatchCollator:
    """Collate a list of mapped per-image dicts into the fixed-shape batch
    dict the compiled step consumes."""

    def __init__(
        self,
        size_divisibility: int = 32,
        size_bucket: int = 32,
        max_gt_instances: int = 100,
        mask_size: int = 0,
        num_keypoints: int = 0,
        pad_value: float = 0.0,
        square: int = 0,
        with_sem_seg: bool = False,
        sem_seg_ignore_value: int = 255,
    ):
        self.size_divisibility = size_divisibility
        self.size_bucket = size_bucket
        self.max_gt_instances = max_gt_instances
        self.mask_size = mask_size
        self.num_keypoints = num_keypoints
        self.pad_value = pad_value
        self.square = square
        self.with_sem_seg = with_sem_seg
        self.sem_seg_ignore_value = sem_seg_ignore_value

    def __call__(self, batch_list: List[dict]) -> Dict[str, Any]:
        B = len(batch_list)
        sizes = [(d["image"].shape[0], d["image"].shape[1]) for d in batch_list]
        if self.square > 0:
            H = W = self.square
        else:
            H = _round_up(_round_up(max(s[0] for s in sizes), self.size_divisibility), self.size_bucket)
            W = _round_up(_round_up(max(s[1] for s in sizes), self.size_divisibility), self.size_bucket)

        images = np.full((B, H, W, batch_list[0]["image"].shape[2]), self.pad_value, np.float32)
        image_sizes = np.zeros((B, 2), np.int32)
        for i, d in enumerate(batch_list):
            h, w = sizes[i]
            images[i, :h, :w] = d["image"]
            image_sizes[i] = (h, w)

        out: Dict[str, Any] = {"image": images, "image_sizes": image_sizes}

        if "instances" in batch_list[0]:
            targets = [
                instances_to_padded_targets(
                    d["instances"],
                    self.max_gt_instances,
                    mask_size=self.mask_size,
                    num_keypoints=self.num_keypoints,
                )
                for d in batch_list
            ]
            for k in targets[0]:
                out[k] = np.stack([t[k] for t in targets])

        if self.with_sem_seg and "sem_seg" in batch_list[0]:
            sem = np.full((B, H, W), self.sem_seg_ignore_value, np.int32)
            for i, d in enumerate(batch_list):
                h, w = sizes[i]
                sem[i, :h, :w] = d["sem_seg"]
            out["gt_sem_seg"] = sem

        # host-side metadata for evaluators (image_id, original sizes, ...)
        out["metadata"] = [
            {k: d[k] for k in ("image_id", "file_name", "height", "width") if k in d}
            for d in batch_list
        ]
        return out


def build_batch_data_loader(
    dataset,
    sampler,
    total_batch_size: int,
    *,
    aspect_ratio_grouping: bool = True,
    num_workers: int = 0,
    collator: Optional[PaddedBatchCollator] = None,
    prefetch: int = 2,
):
    """Batched infinite loader (reference build.py:294-400). total_batch_size
    is divided by the number of host processes, same as the reference divides
    by world size."""
    world_size = comm.get_world_size()
    assert total_batch_size % world_size == 0, (
        f"Total batch size ({total_batch_size}) must be divisible by the number of processes ({world_size})."
    )
    batch_size = total_batch_size // world_size

    iterable = ToIterableDataset(dataset, sampler)
    if aspect_ratio_grouping:
        batches = AspectRatioGroupedDataset(iterable, batch_size)
    else:

        def _chunks():
            it = iter(iterable)
            while True:
                yield [next(it) for _ in range(batch_size)]

        batches = _chunks()

    collator = collator or PaddedBatchCollator()

    def _gen():
        for batch in batches:
            yield collator(batch)

    if prefetch > 0:
        return _ThreadPrefetcher(_gen(), prefetch)
    return _gen()


class _ThreadPrefetcher:
    """Background-thread prefetch so host preprocessing overlaps device steps
    (the single-controller analogue of DataLoader workers)."""

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading

        self._it = iterator
        self._q = queue.Queue(maxsize=depth)
        self._done = object()

        def worker():
            try:
                for item in self._it:
                    self._q.put(item)
            except BaseException as e:  # propagate errors to the consumer
                self._q.put(e)
            self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


def _train_loader_from_config(cfg, mapper=None, *, dataset=None, sampler=None):
    if dataset is None:
        dataset = get_detection_dataset_dicts(
            cfg.DATASETS.TRAIN,
            filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
            min_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE
            if cfg.MODEL.KEYPOINT_ON
            else 0,
            proposal_files=cfg.DATASETS.PROPOSAL_FILES_TRAIN if cfg.MODEL.LOAD_PROPOSALS else None,
        )
    if mapper is None:
        mapper = DatasetMapper(cfg, True)

    if sampler is None:
        sampler_name = cfg.DATALOADER.SAMPLER_TRAIN
        logger.info("Using training sampler {}".format(sampler_name))
        if sampler_name == "TrainingSampler":
            sampler = TrainingSampler(len(dataset))
        elif sampler_name == "RepeatFactorTrainingSampler":
            repeat_factors = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(
                dataset, cfg.DATALOADER.REPEAT_THRESHOLD, sqrt=cfg.DATALOADER.REPEAT_SQRT
            )
            sampler = RepeatFactorTrainingSampler(repeat_factors)
        elif sampler_name == "RandomSubsetTrainingSampler":
            sampler = RandomSubsetTrainingSampler(len(dataset), cfg.DATALOADER.RANDOM_SUBSET_RATIO)
        else:
            raise ValueError("Unknown training sampler: {}".format(sampler_name))

    collator = PaddedBatchCollator(
        size_divisibility=32,
        size_bucket=cfg.TPU.SIZE_BUCKET,
        max_gt_instances=cfg.TPU.MAX_GT_INSTANCES,
        mask_size=2 * cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION if cfg.MODEL.MASK_ON else 0,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS if cfg.MODEL.KEYPOINT_ON else 0,
        with_sem_seg="SemanticSegmentor" in cfg.MODEL.META_ARCHITECTURE
        or "PanopticFPN" in cfg.MODEL.META_ARCHITECTURE,
        sem_seg_ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
    )
    return {
        "dataset": dataset,
        "sampler": sampler,
        "mapper": mapper,
        "total_batch_size": cfg.SOLVER.IMS_PER_BATCH,
        "aspect_ratio_grouping": cfg.DATALOADER.ASPECT_RATIO_GROUPING,
        "num_workers": cfg.DATALOADER.NUM_WORKERS,
        "collator": collator,
    }


@configurable(from_config=_train_loader_from_config)
def build_detection_train_loader(
    dataset,
    *,
    mapper,
    sampler=None,
    total_batch_size: int = 16,
    aspect_ratio_grouping: bool = True,
    num_workers: int = 0,
    collator=None,
):
    """Build the training loader yielding padded batch dicts
    (reference build.py:521)."""
    if isinstance(dataset, list):
        dataset = DatasetFromList(dataset, copy=False)
    if mapper is not None:
        dataset = MapDataset(dataset, mapper)
    if sampler is None:
        sampler = TrainingSampler(len(dataset))
    return build_batch_data_loader(
        dataset,
        sampler,
        total_batch_size,
        aspect_ratio_grouping=aspect_ratio_grouping,
        num_workers=num_workers,
        collator=collator,
    )


def _test_loader_from_config(cfg, dataset_name, mapper=None):
    if isinstance(dataset_name, str):
        dataset_name = [dataset_name]
    dataset = get_detection_dataset_dicts(
        dataset_name,
        filter_empty=False,
        proposal_files=[
            cfg.DATASETS.PROPOSAL_FILES_TEST[list(cfg.DATASETS.TEST).index(x)] for x in dataset_name
        ]
        if cfg.MODEL.LOAD_PROPOSALS
        else None,
    )
    if mapper is None:
        mapper = DatasetMapper(cfg, False)
    collator = PaddedBatchCollator(
        size_divisibility=32,
        size_bucket=cfg.TPU.SIZE_BUCKET,
        square=cfg.TPU.FIXED_TEST_SIZE,
    )
    return {
        "dataset": dataset,
        "mapper": mapper,
        "num_workers": cfg.DATALOADER.NUM_WORKERS,
        "sampler": InferenceSampler(len(dataset)),
        "collator": collator,
    }


@configurable(from_config=_test_loader_from_config)
def build_detection_test_loader(dataset, *, mapper, sampler=None, batch_size: int = 1, num_workers: int = 0, collator=None):
    """Build the test loader: exact partition, batch_size images per step
    (reference build.py:621; batch_size=1 default like the reference)."""
    if isinstance(dataset, list):
        dataset = DatasetFromList(dataset, copy=False)
    if mapper is not None:
        dataset = MapDataset(dataset, mapper)
    if sampler is None:
        sampler = InferenceSampler(len(dataset))
    collator = collator or PaddedBatchCollator()

    def _gen():
        buf = []
        for idx in sampler:
            buf.append(dataset[idx])
            if len(buf) == batch_size:
                yield collator(buf)
                buf = []
        if buf:
            yield collator(buf)

    return _gen()


def trivial_batch_collator(batch):
    """A batch collator that does nothing (reference build.py:685)."""
    return batch


def worker_init_reset_seed(worker_id: int):
    from detectron2_tpu.utils.env import seed_all_rng

    initial_seed = np.random.randint(2**31) + worker_id
    seed_all_rng(initial_seed)
