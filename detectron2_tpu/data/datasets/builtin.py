"""Register builtin datasets under $DETECTRON2_DATASETS
(reference detectron2/data/datasets/builtin.py:101-259).

This file registers "hard-coded" standard datasets (COCO and variants,
including the tiny coco_2017_val_100 test subsets). Assumes the standard
dataset layout under the root given by $DETECTRON2_DATASETS (default
"datasets/").
"""

import os

from detectron2_tpu.data.catalog import MetadataCatalog
from detectron2_tpu.data.datasets.builtin_meta import _get_builtin_metadata
from detectron2_tpu.data.datasets.coco import register_coco_instances

# ==== Predefined datasets and splits for COCO ==========
_PREDEFINED_SPLITS_COCO = {
    "coco": {
        "coco_2014_train": ("coco/train2014", "coco/annotations/instances_train2014.json"),
        "coco_2014_val": ("coco/val2014", "coco/annotations/instances_val2014.json"),
        "coco_2014_minival": ("coco/val2014", "coco/annotations/instances_minival2014.json"),
        "coco_2014_valminusminival": (
            "coco/val2014",
            "coco/annotations/instances_valminusminival2014.json",
        ),
        "coco_2017_train": ("coco/train2017", "coco/annotations/instances_train2017.json"),
        "coco_2017_val": ("coco/val2017", "coco/annotations/instances_val2017.json"),
        "coco_2017_test": ("coco/test2017", "coco/annotations/image_info_test2017.json"),
        "coco_2017_test-dev": ("coco/test2017", "coco/annotations/image_info_test-dev2017.json"),
        "coco_2017_val_100": ("coco/val2017", "coco/annotations/instances_val2017_100.json"),
    },
    "coco_person": {
        "keypoints_coco_2014_train": (
            "coco/train2014",
            "coco/annotations/person_keypoints_train2014.json",
        ),
        "keypoints_coco_2014_val": ("coco/val2014", "coco/annotations/person_keypoints_val2014.json"),
        "keypoints_coco_2014_minival": (
            "coco/val2014",
            "coco/annotations/person_keypoints_minival2014.json",
        ),
        "keypoints_coco_2017_train": (
            "coco/train2017",
            "coco/annotations/person_keypoints_train2017.json",
        ),
        "keypoints_coco_2017_val": ("coco/val2017", "coco/annotations/person_keypoints_val2017.json"),
        "keypoints_coco_2017_val_100": (
            "coco/val2017",
            "coco/annotations/person_keypoints_val2017_100.json",
        ),
    },
}


def register_all_coco(root):
    for dataset_name, splits_per_dataset in _PREDEFINED_SPLITS_COCO.items():
        for key, (image_root, json_file) in splits_per_dataset.items():
            register_coco_instances(
                key,
                _get_builtin_metadata(dataset_name),
                os.path.join(root, json_file) if "://" not in json_file else json_file,
                os.path.join(root, image_root),
            )


_root = os.path.expanduser(os.getenv("DETECTRON2_DATASETS", "datasets"))
# only register once (e.g. under pytest importing twice)
if "coco_2017_train" not in MetadataCatalog.list():
    register_all_coco(_root)
