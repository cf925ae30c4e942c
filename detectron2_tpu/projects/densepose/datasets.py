"""DensePose dataset registrations beyond COCO: DensePose-LVIS (animal
categories re-annotated with CSE vertex data) and the ChimpnSee video dataset
used for bootstrapping (reference
projects/DensePose/densepose/data/datasets/lvis.py:22-230, chimpnsee.py:1-31).

The COCO splits live in dataset_mapper.register_densepose_coco; this module
completes the reference's dataset catalog surface.
"""

import json
import logging
import os
from collections import defaultdict
from typing import Any, Dict, List, Optional

from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_tpu.structures import BoxMode

from .build import DatasetType
from .video import maybe_prepend_base_path

__all__ = [
    "DENSEPOSE_LVIS_DATASETS",
    "load_densepose_lvis_json",
    "register_densepose_lvis",
    "register_chimpnsee",
    "CHIMPNSEE_DATASET_NAME",
]

logger = logging.getLogger(__name__)

# every annotation key any DensePose variant may carry
# (reference datasets/coco.py DENSEPOSE_ALL_POSSIBLE_KEYS)
DENSEPOSE_ALL_POSSIBLE_KEYS = [
    "dp_x",
    "dp_y",
    "dp_I",
    "dp_U",
    "dp_V",
    "dp_masks",
    "dp_vertex",
    "ref_model",
]

# name -> (images_root, annotations json) under $DETECTRON2_DATASETS
# (reference datasets/lvis.py:22-48; images_root "coco_" holds the
# train2017/val2017 trees the LVIS jsons reference by coco_url)
DENSEPOSE_LVIS_DATASETS = {
    "densepose_lvis_v1_ds1_train_v1": ("coco_", "lvis/densepose_lvis_v1_ds1_train_v1.json"),
    "densepose_lvis_v1_ds1_val_v1": ("coco_", "lvis/densepose_lvis_v1_ds1_val_v1.json"),
    "densepose_lvis_v1_ds2_train_v1": ("coco_", "lvis/densepose_lvis_v1_ds2_train_v1.json"),
    "densepose_lvis_v1_ds2_val_v1": ("coco_", "lvis/densepose_lvis_v1_ds2_val_v1.json"),
    "densepose_lvis_v1_ds1_val_animals_100": (
        "coco_",
        "lvis/densepose_lvis_v1_val_animals_100_v2.json",
    ),
}


def load_densepose_lvis_json(
    json_file: str, image_root: str, dataset_name: Optional[str] = None
) -> List[Dict[str, Any]]:
    """LVIS-format json -> dataset dicts, carrying the dp_* / CSE annotation
    keys through (reference datasets/lvis.py:128-230). Unlike the plain LVIS
    loader, category ids are kept RAW — the reference postpones category
    mapping so several animal datasets with coherent-but-different category
    sets can be merged (DATASETS.CATEGORY_MAPS)."""
    with open(json_file) as f:
        lvis = json.load(f)

    if dataset_name is not None:
        cats = sorted(lvis.get("categories", []), key=lambda x: x["id"])
        thing_classes = [c.get("synonyms", [c.get("name", str(c["id"]))])[0] for c in cats]
        MetadataCatalog.get(dataset_name).set(thing_classes=thing_classes)

    imgs = {img["id"]: img for img in lvis.get("images", [])}
    anns_by_img = defaultdict(list)
    ann_ids = set()
    for ann in lvis.get("annotations", []):
        assert ann["id"] not in ann_ids, f"duplicate annotation id {ann['id']} in {json_file}"
        ann_ids.add(ann["id"])
        anns_by_img[ann["image_id"]].append(ann)

    dataset_dicts = []
    for img_id in sorted(imgs.keys()):
        img = imgs[img_id]
        if "file_name" in img:
            file_name = img["file_name"]
        else:
            file_name = "/".join(img["coco_url"].split("/")[-2:])
        record = {
            "file_name": os.path.join(image_root, file_name),
            "height": img["height"],
            "width": img["width"],
            "image_id": img_id,
        }
        objs = []
        for ann in anns_by_img.get(img_id, []):
            assert ann["image_id"] == img_id
            obj: Dict[str, Any] = {
                "iscrowd": ann.get("iscrowd", 0),
                "category_id": ann["category_id"],
            }
            if "bbox" in ann:
                obj["bbox"] = ann["bbox"]
                obj["bbox_mode"] = BoxMode.XYWH_ABS
            segm = ann.get("segmentation")
            if segm:
                valid_segm = [poly for poly in segm if len(poly) % 2 == 0 and len(poly) >= 6]
                obj["segmentation"] = valid_segm
            if "keypoints" in ann:
                obj["keypoints"] = ann["keypoints"]
            for key in DENSEPOSE_ALL_POSSIBLE_KEYS:
                if key in ann:
                    obj[key] = ann[key]
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)

    logger.info(f"Loaded {len(dataset_dicts)} images in DensePose-LVIS format from {json_file}")
    return dataset_dicts


def register_densepose_lvis(root: Optional[str] = None) -> None:
    """Register the DensePose-LVIS splits (reference datasets/lvis.py:233-257)."""
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    for name, (images_root, annotations_fpath) in DENSEPOSE_LVIS_DATASETS.items():
        if name in DatasetCatalog:
            continue
        image_dir = maybe_prepend_base_path(root, images_root)
        json_path = maybe_prepend_base_path(root, annotations_fpath)
        DatasetCatalog.register(
            name,
            (lambda j=json_path, d=image_dir, n=name: load_densepose_lvis_json(j, d, n)),
        )
        MetadataCatalog.get(name).set(
            json_file=json_path,
            image_root=image_dir,
            evaluator_type="lvis",
        )


CHIMPNSEE_DATASET_NAME = "chimpnsee"


def register_chimpnsee(root: Optional[str] = None) -> None:
    """Register the ChimpnSee video dataset schema for bootstrapping
    (reference datasets/chimpnsee.py:15-31): a VIDEO_LIST catalog entry whose
    frames are decoded lazily by VideoKeyframeDataset (PyAV-gated)."""
    if CHIMPNSEE_DATASET_NAME in DatasetCatalog:
        return
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")
    video_list_fpath = maybe_prepend_base_path(root, "chimpnsee/cdna.eva.mpg.de/video_list.txt")
    video_base_path = maybe_prepend_base_path(root, "chimpnsee/cdna.eva.mpg.de")

    DatasetCatalog.register(CHIMPNSEE_DATASET_NAME, lambda: [])
    MetadataCatalog.get(CHIMPNSEE_DATASET_NAME).set(
        dataset_type=DatasetType.VIDEO_LIST,
        video_list_fpath=video_list_fpath,
        video_base_path=video_base_path,
        category="chimpanzee",
    )
