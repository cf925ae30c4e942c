"""Pascal VOC dataset loading (reference detectron2/data/datasets/pascal_voc.py:25-82)."""

import os
import xml.etree.ElementTree as ET
from typing import List, Tuple, Union

import numpy as np

from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_tpu.structures import BoxMode
from detectron2_tpu.utils.file_io import PathManager

__all__ = ["load_voc_instances", "register_pascal_voc", "CLASS_NAMES"]

CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def load_voc_instances(dirname: str, split: str, class_names: Union[List[str], Tuple[str, ...]]) -> List[dict]:
    """
    Args:
        dirname: contains "Annotations", "ImageSets", "JPEGImages"
        split: "train", "test", "val", "trainval"
    """
    with PathManager.open(os.path.join(dirname, "ImageSets", "Main", split + ".txt")) as f:
        fileids = np.loadtxt(f, dtype=str)

    annotation_dirname = os.path.join(dirname, "Annotations/")
    dicts = []
    for fileid in fileids:
        anno_file = os.path.join(annotation_dirname, fileid + ".xml")
        jpeg_file = os.path.join(dirname, "JPEGImages", fileid + ".jpg")

        with PathManager.open(anno_file) as f:
            tree = ET.parse(f)

        r = {
            "file_name": jpeg_file,
            "image_id": fileid,
            "height": int(tree.findall("./size/height")[0].text),
            "width": int(tree.findall("./size/width")[0].text),
        }
        instances = []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            difficult = int(obj.find("difficult").text) if obj.find("difficult") is not None else 0
            if difficult == 1:
                continue
            bbox = obj.find("bndbox")
            bbox = [float(bbox.find(x).text) for x in ["xmin", "ymin", "xmax", "ymax"]]
            # VOC is 1-indexed with inclusive max; convert to float XYXY
            bbox[0] -= 1.0
            bbox[1] -= 1.0
            instances.append(
                {"category_id": class_names.index(cls), "bbox": bbox, "bbox_mode": BoxMode.XYXY_ABS}
            )
        r["annotations"] = instances
        dicts.append(r)
    return dicts


def register_pascal_voc(name: str, dirname: str, split: str, year: int, class_names=CLASS_NAMES) -> None:
    DatasetCatalog.register(name, lambda: load_voc_instances(dirname, split, class_names))
    MetadataCatalog.get(name).set(
        thing_classes=list(class_names), dirname=dirname, year=year, split=split, evaluator_type="pascal_voc"
    )
