"""LVIS dataset loading (reference detectron2/data/datasets/lvis.py:41-150),
parsed directly from the json (no lvis-api)."""

import json
import logging
import os
from collections import defaultdict
from typing import List, Optional

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.structures import BoxMode
from detectron2_tpu.utils.file_io import PathManager

logger = logging.getLogger(__name__)

__all__ = ["load_lvis_json", "register_lvis_instances", "get_lvis_instances_meta"]


def register_lvis_instances(name: str, metadata: dict, json_file: str, image_root: str) -> None:
    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="lvis", **metadata
    )


def load_lvis_json(json_file: str, image_root: str, dataset_name: Optional[str] = None) -> List[dict]:
    json_file = PathManager.get_local_path(json_file)
    with open(json_file) as f:
        lvis = json.load(f)

    if dataset_name is not None:
        meta = get_lvis_instances_meta_from_json(lvis)
        MetadataCatalog.get(dataset_name).set(**meta)

    imgs = {img["id"]: img for img in lvis.get("images", [])}
    anns_by_img = defaultdict(list)
    for ann in lvis.get("annotations", []):
        anns_by_img[ann["image_id"]].append(ann)

    dataset_dicts = []
    for img_id in sorted(imgs.keys()):
        img = imgs[img_id]
        record = {}
        # LVIS v1 stores the full COCO path in coco_url
        if "file_name" in img:
            file_name = img["file_name"]
        else:
            coco_url = img["coco_url"]
            file_name = "/".join(coco_url.split("/")[-2:])
        record["file_name"] = os.path.join(image_root, file_name)
        record["height"] = img["height"]
        record["width"] = img["width"]
        record["image_id"] = img_id
        record["not_exhaustive_category_ids"] = img.get("not_exhaustive_category_ids", [])
        record["neg_category_ids"] = img.get("neg_category_ids", [])

        objs = []
        for ann in anns_by_img.get(img_id, []):
            obj = {
                "bbox": ann["bbox"],
                "bbox_mode": BoxMode.XYWH_ABS,
                # LVIS categories are already 1..C -> contiguous 0..C-1
                "category_id": ann["category_id"] - 1,
            }
            segm = ann.get("segmentation", None)
            if segm:
                valid_segm = [poly for poly in segm if len(poly) % 2 == 0 and len(poly) >= 6]
                obj["segmentation"] = valid_segm
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)

    logger.info(f"Loaded {len(dataset_dicts)} images in LVIS format from {json_file}")
    return dataset_dicts


def get_lvis_instances_meta_from_json(lvis_json: dict) -> dict:
    cats = sorted(lvis_json.get("categories", []), key=lambda x: x["id"])
    thing_classes = [c.get("synonyms", [c.get("name", str(c["id"]))])[0] for c in cats]
    return {"thing_classes": thing_classes, "class_image_count": [
        {"id": c["id"], "image_count": c.get("image_count", 1)} for c in cats
    ]}


def get_lvis_instances_meta(dataset_name: str) -> dict:
    """Static metadata per LVIS version (reference lvis.py:95-118).

    ``class_image_count`` for v1 comes from the vendored release table so
    federated-loss weights (detection_utils.get_fed_loss_cls_weights) can be
    computed at model-construction time without the json on disk;
    ``thing_classes`` stays json-derived at load time."""
    if "v1" in dataset_name:
        from detectron2_tpu.data.datasets.lvis_v1_category_image_count import (
            LVIS_V1_CATEGORY_IMAGE_COUNT,
        )

        return {"class_image_count": LVIS_V1_CATEGORY_IMAGE_COUNT}
    return {}
