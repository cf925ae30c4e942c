"""Cityscapes dataset loading (reference detectron2/data/datasets/cityscapes.py:53-180).

Parses the *_polygons.json / instanceIds.png ground truth directly (the
cityscapesscripts dependency is optional and only needed for instance masks
from instanceIds)."""

import functools
import json
import logging
import multiprocessing as mp
import os
from typing import List

import numpy as np

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.structures import BoxMode
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["load_cityscapes_instances", "load_cityscapes_semantic", "register_cityscapes"]

# the 8 "thing" classes of the cityscapes instance benchmark
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


def _get_files(image_dir: str, gt_dir: str):
    files = []
    for city in PathManager.ls(image_dir):
        city_img_dir = os.path.join(image_dir, city)
        city_gt_dir = os.path.join(gt_dir, city)
        if not PathManager.isdir(city_img_dir):
            continue
        for basename in PathManager.ls(city_img_dir):
            if not basename.endswith("leftImg8bit.png"):
                continue
            image_file = os.path.join(city_img_dir, basename)
            suffix_len = len("leftImg8bit.png")
            prefix = basename[:-suffix_len]
            files.append(
                (
                    image_file,
                    os.path.join(city_gt_dir, prefix + "gtFine_polygons.json"),
                    os.path.join(city_gt_dir, prefix + "gtFine_labelIds.png"),
                )
            )
    assert len(files), f"No images found in {image_dir}"
    return files


def load_cityscapes_instances(image_dir: str, gt_dir: str, from_json: bool = True, to_polygons: bool = True) -> List[dict]:
    """Load cityscapes instance annotations from the polygon json files."""
    files = _get_files(image_dir, gt_dir)
    ret = []
    for image_file, polygon_file, _ in files:
        with PathManager.open(polygon_file) as f:
            poly_json = json.load(f)
        record = {
            "file_name": image_file,
            "image_id": os.path.basename(image_file),
            "height": poly_json["imgHeight"],
            "width": poly_json["imgWidth"],
        }
        annos = []
        for obj in poly_json["objects"]:
            label = obj["label"]
            deleted = obj.get("deleted", 0)
            if deleted:
                continue
            # group labels ("car group") are crowd regions
            iscrowd = 0
            if label.endswith("group"):
                label = label[: -len("group")]
                iscrowd = 1
            if label not in CITYSCAPES_THING_CLASSES:
                continue
            polygon = np.asarray(obj["polygon"], dtype=np.float64)
            if len(polygon) < 3:
                continue
            flat = polygon.reshape(-1)
            xs, ys = polygon[:, 0], polygon[:, 1]
            annos.append(
                {
                    "category_id": CITYSCAPES_THING_CLASSES.index(label),
                    "bbox": [xs.min(), ys.min(), xs.max(), ys.max()],
                    "bbox_mode": BoxMode.XYXY_ABS,
                    "segmentation": [flat.tolist()],
                    "iscrowd": iscrowd,
                }
            )
        record["annotations"] = annos
        ret.append(record)
    logger.info("Loaded %d images from %s", len(ret), image_dir)
    return ret


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    """Load cityscapes semantic segmentation file pairs."""
    ret = []
    for image_file, _, label_file in _get_files(image_dir, gt_dir):
        ret.append(
            {
                "file_name": image_file,
                "sem_seg_file_name": label_file.replace("labelIds", "labelTrainIds")
                if PathManager.exists(label_file.replace("labelIds", "labelTrainIds"))
                else label_file,
            }
        )
    return ret


def register_cityscapes(name: str, image_dir: str, gt_dir: str, instances: bool = True) -> None:
    if instances:
        DatasetCatalog.register(name, lambda: load_cityscapes_instances(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            thing_classes=CITYSCAPES_THING_CLASSES,
            image_dir=image_dir,
            gt_dir=gt_dir,
            evaluator_type="cityscapes_instance",
        )
    else:
        DatasetCatalog.register(name, lambda: load_cityscapes_semantic(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            image_dir=image_dir, gt_dir=gt_dir, evaluator_type="cityscapes_sem_seg", ignore_label=255
        )
