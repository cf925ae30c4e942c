"""Cityscapes panoptic dataset registration
(reference detectron2/data/datasets/cityscapes_panoptic.py:1-187).

Loads the cityscapes panoptic format produced by the official
``createPanopticImgs`` conversion: a ``*.json`` listing annotations whose
``file_name`` points at a panoptic PNG in ``gt_dir`` and whose
``segments_info`` carry raw cityscapes label ids that are remapped to the
contiguous thing/stuff id spaces here.
"""

import json
import logging
import os
from typing import List

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["load_cityscapes_panoptic", "register_all_cityscapes_panoptic"]


def get_cityscapes_panoptic_files(image_dir: str, gt_dir: str, json_info: dict):
    files = []
    cities = PathManager.ls(image_dir)
    image_dict = {}
    for city in cities:
        city_img_dir = os.path.join(image_dir, city)
        for basename in PathManager.ls(city_img_dir):
            image_file = os.path.join(city_img_dir, basename)
            suffix = "_leftImg8bit.png"
            if not basename.endswith(suffix):
                continue
            image_dict[basename[: -len(suffix)]] = image_file

    for ann in json_info["annotations"]:
        image_file = image_dict.get(ann["image_id"])
        assert image_file is not None, f"No image {ann['image_id']} in {image_dir}"
        label_file = os.path.join(gt_dir, ann["file_name"])
        files.append((image_file, label_file, ann["segments_info"]))
    assert len(files), f"No images found in {image_dir}"
    return files


def load_cityscapes_panoptic(image_dir: str, gt_dir: str, gt_json: str, meta: dict) -> List[dict]:
    """Return dataset dicts with pan_seg_file_name + segments_info (category
    ids remapped to the contiguous spaces in ``meta``)."""

    def _convert_category_id(segment_info, meta):
        seg = dict(segment_info)
        cid = seg["category_id"]
        if cid in meta["thing_dataset_id_to_contiguous_id"]:
            seg["category_id"] = meta["thing_dataset_id_to_contiguous_id"][cid]
            seg["isthing"] = True
        else:
            seg["category_id"] = meta["stuff_dataset_id_to_contiguous_id"][cid]
            seg["isthing"] = False
        return seg

    assert os.path.exists(gt_json), (
        f"Please run `python cityscapesscripts/preparation/createPanopticImgs.py` "
        f"to generate label files (missing {gt_json})."
    )
    with open(gt_json) as f:
        json_info = json.load(f)

    files = get_cityscapes_panoptic_files(image_dir, gt_dir, json_info)
    ret = []
    for image_file, label_file, segments_info in files:
        sem_label_file = (
            image_file.replace("leftImg8bit", "gtFine").split(".")[0] + "_labelTrainIds.png"
        )
        segments_info = [_convert_category_id(x, meta) for x in segments_info]
        ret.append(
            {
                "file_name": image_file,
                "image_id": "_".join(
                    os.path.splitext(os.path.basename(image_file))[0].split("_")[:3]
                ),
                "sem_seg_file_name": sem_label_file,
                "pan_seg_file_name": label_file,
                "segments_info": segments_info,
            }
        )
    return ret


_RAW_CITYSCAPES_PANOPTIC_SPLITS = {
    "cityscapes_fine_panoptic_train": (
        "cityscapes/leftImg8bit/train",
        "cityscapes/gtFine/cityscapes_panoptic_train",
        "cityscapes/gtFine/cityscapes_panoptic_train.json",
    ),
    "cityscapes_fine_panoptic_val": (
        "cityscapes/leftImg8bit/val",
        "cityscapes/gtFine/cityscapes_panoptic_val",
        "cityscapes/gtFine/cityscapes_panoptic_val.json",
    ),
}


def register_all_cityscapes_panoptic(root: str) -> None:
    from detectron2_tpu.data.datasets.builtin_meta import _get_builtin_metadata

    meta = _get_builtin_metadata("cityscapes")
    for key, (image_dir, gt_dir, gt_json) in _RAW_CITYSCAPES_PANOPTIC_SPLITS.items():
        image_dir = os.path.join(root, image_dir)
        gt_dir = os.path.join(root, gt_dir)
        gt_json = os.path.join(root, gt_json)
        DatasetCatalog.register(
            key,
            lambda x=image_dir, y=gt_dir, z=gt_json: load_cityscapes_panoptic(x, y, z, meta),
        )
        MetadataCatalog.get(key).set(
            panoptic_root=gt_dir,
            image_root=image_dir,
            panoptic_json=gt_json,
            gt_dir=gt_dir.replace("cityscapes_panoptic_", ""),
            evaluator_type="cityscapes_panoptic_seg",
            ignore_label=255,
            label_divisor=1000,
            **meta,
        )
