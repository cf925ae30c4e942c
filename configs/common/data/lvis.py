"""LVIS v1 instance loaders (the inline recipe of reference
projects/ViTDet/configs/LVIS/*.py, factored like configs/common/data/coco.py):
RepeatFactor class-balanced sampling at threshold 0.001, LVISEvaluator at
300 detections/image."""

from detectron2_tpu.config import DictConfig, LazyCall as L
from detectron2_tpu.data import (
    DatasetMapper,
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
)
from detectron2_tpu.data import transforms as T
from detectron2_tpu.data.samplers import RepeatFactorTrainingSampler
from detectron2_tpu.evaluation import LVISEvaluator

dataloader = DictConfig()

# shared node: the sampler's repeat factors are computed from the same
# dataset dicts the loader consumes (no interpolation in this LazyConfig)
_train_dataset = L(get_detection_dataset_dicts)(names="lvis_v1_train")

dataloader.train = L(build_detection_train_loader)(
    dataset=_train_dataset,
    mapper=L(DatasetMapper)(
        is_train=True,
        augmentations=[
            L(T.ResizeShortestEdge)(
                short_edge_length=(640, 672, 704, 736, 768, 800),
                sample_style="choice",
                max_size=1333,
            ),
            L(T.RandomFlip)(horizontal=True),
        ],
        image_format="BGR",
        use_instance_mask=True,
    ),
    sampler=L(RepeatFactorTrainingSampler)(
        repeat_factors=L(RepeatFactorTrainingSampler.repeat_factors_from_category_frequency)(
            dataset_dicts=_train_dataset, repeat_thresh=0.001
        )
    ),
    total_batch_size=16,
    num_workers=4,
)

dataloader.test = L(build_detection_test_loader)(
    dataset=L(get_detection_dataset_dicts)(names="lvis_v1_val", filter_empty=False),
    mapper=L(DatasetMapper)(
        is_train=False,
        augmentations=[
            L(T.ResizeShortestEdge)(short_edge_length=800, max_size=1333),
        ],
        image_format="BGR",
    ),
    num_workers=4,
)

dataloader.evaluator = L(LVISEvaluator)(
    dataset_name="lvis_v1_val", max_dets_per_image=300
)
