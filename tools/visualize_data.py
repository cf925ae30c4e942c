#!/usr/bin/env python
"""Visualize ground truth of a dataset, either raw annotations or after the
training dataloader's augmentations (reference tools/visualize_data.py)."""

import argparse
import os

import numpy as np

import detectron2_tpu.data.datasets  # noqa
from detectron2_tpu.config import get_cfg
from detectron2_tpu.data import DatasetCatalog, MetadataCatalog, detection_utils
from detectron2_tpu.data.dataset_mapper import DatasetMapper
from detectron2_tpu.utils.logger import setup_logger
from detectron2_tpu.utils.visualizer import Visualizer


def parse_args():
    parser = argparse.ArgumentParser(description="Visualize ground-truth data")
    parser.add_argument("--source", choices=["annotation", "dataloader"], default="annotation")
    parser.add_argument("--config-file", metavar="FILE")
    parser.add_argument("--output-dir", default="./")
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    return parser.parse_args()


def main():
    args = parse_args()
    setup_logger()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    dataset_name = cfg.DATASETS.TRAIN[0]
    metadata = MetadataCatalog.get(dataset_name)
    dicts = DatasetCatalog.get(dataset_name)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.source == "dataloader":
        mapper = DatasetMapper(cfg, True)

    for dic in dicts[:50]:
        if args.source == "dataloader":
            dic = mapper(dict(dic))
            img = detection_utils.convert_image_to_rgb(dic["image"], cfg.INPUT.FORMAT)
        else:
            img = detection_utils.read_image(dic["file_name"], "RGB")
        visualizer = Visualizer(img, metadata=metadata, scale=args.scale)
        vis = visualizer.draw_dataset_dict(dic)
        filepath = os.path.join(args.output_dir, os.path.basename(dic["file_name"]))
        vis.save(filepath)
        print("saved", filepath)


if __name__ == "__main__":
    main()
