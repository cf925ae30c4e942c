#!/usr/bin/env python
"""Visualize detection results saved in COCO json format
(reference tools/visualize_json_results.py)."""

import argparse
import json
import os
from collections import defaultdict

import numpy as np

import detectron2_tpu.data.datasets  # noqa
from detectron2_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_tpu.structures import Boxes, BoxMode, Instances
from detectron2_tpu.utils.logger import setup_logger
from detectron2_tpu.utils.visualizer import Visualizer


def create_instances(predictions, image_size, metadata, conf_threshold):
    ret = Instances(image_size)
    score = np.asarray([x["score"] for x in predictions])
    chosen = (score > conf_threshold).nonzero()[0]
    score = score[chosen]
    bbox = np.asarray([predictions[i]["bbox"] for i in chosen]).reshape(-1, 4)
    bbox = BoxMode.convert(bbox, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)

    if hasattr(metadata, "thing_dataset_id_to_contiguous_id"):
        labels = np.asarray(
            [metadata.thing_dataset_id_to_contiguous_id[predictions[i]["category_id"]] for i in chosen]
        )
    else:
        labels = np.asarray([predictions[i]["category_id"] for i in chosen])

    ret.scores = score
    ret.pred_boxes = Boxes(bbox.astype(np.float32))
    ret.pred_classes = labels
    return ret


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="JSON file produced by the model")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--dataset", default="coco_2017_val")
    parser.add_argument("--conf-threshold", default=0.5, type=float)
    args = parser.parse_args()

    setup_logger()

    with open(args.input) as f:
        predictions = json.load(f)

    pred_by_image = defaultdict(list)
    for p in predictions:
        pred_by_image[p["image_id"]].append(p)

    dicts = DatasetCatalog.get(args.dataset)
    metadata = MetadataCatalog.get(args.dataset)
    os.makedirs(args.output, exist_ok=True)

    from detectron2_tpu.data.detection_utils import read_image

    for dic in dicts:
        img = read_image(dic["file_name"], "RGB")
        basename = os.path.basename(dic["file_name"])
        preds = create_instances(
            pred_by_image[dic["image_id"]], img.shape[:2], metadata, args.conf_threshold
        )
        vis = Visualizer(img, metadata)
        vis_pred = vis.draw_instance_predictions(preds).get_image()

        vis = Visualizer(img, metadata)
        vis_gt = vis.draw_dataset_dict(dic).get_image()

        concat = np.concatenate((vis_pred, vis_gt), axis=1)
        from PIL import Image

        Image.fromarray(concat).save(os.path.join(args.output, basename))


if __name__ == "__main__":
    main()
