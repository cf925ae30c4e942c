#!/usr/bin/env python
"""Image/video demo CLI (reference demo/demo.py)."""

import argparse
import glob
import logging
import os
import time

import numpy as np

import detectron2_tpu.data.datasets  # noqa: register builtin datasets
from detectron2_tpu.config import get_cfg
from detectron2_tpu.data.detection_utils import read_image
from detectron2_tpu.utils.logger import setup_logger

from predictor import VisualizationDemo  # noqa: E402 (demo-local import)


def setup_cfg(args):
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.freeze()
    return cfg


def get_parser():
    parser = argparse.ArgumentParser(description="detectron2_tpu demo")
    parser.add_argument(
        "--config-file",
        default="configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml",
        metavar="FILE",
        help="path to config file",
    )
    parser.add_argument("--webcam", action="store_true", help="Take inputs from webcam.")
    parser.add_argument("--video-input", help="Path to video file.")
    parser.add_argument("--input", nargs="+", help="A list of space separated input images, or a glob pattern")
    parser.add_argument("--output", help="Output directory or file path.")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    return parser


def main():
    args = get_parser().parse_args()
    setup_logger(name="fvcore")
    logger = setup_logger()
    logger.info("Arguments: " + str(args))

    cfg = setup_cfg(args)
    demo = VisualizationDemo(cfg)

    if args.input:
        if len(args.input) == 1:
            args.input = glob.glob(os.path.expanduser(args.input[0])) or args.input
        for path in args.input:
            img = read_image(path, format="BGR")
            start_time = time.time()
            predictions, visualized_output = demo.run_on_image(img)
            n = len(predictions["instances"]) if "instances" in predictions else "?"
            logger.info(f"{path}: {n} instances in {time.time() - start_time:.2f}s")
            if args.output:
                if os.path.isdir(args.output):
                    out_filename = os.path.join(args.output, os.path.basename(path))
                else:
                    assert len(args.input) == 1, "Please specify a directory with args.output"
                    out_filename = args.output
                visualized_output.save(out_filename)
    elif args.video_input:
        import cv2

        video = cv2.VideoCapture(args.video_input)
        width = int(video.get(cv2.CAP_PROP_FRAME_WIDTH))
        height = int(video.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = video.get(cv2.CAP_PROP_FPS)
        basename = os.path.basename(args.video_input)
        if args.output:
            output_fname = os.path.join(args.output, basename) if os.path.isdir(args.output) else args.output
            writer = cv2.VideoWriter(
                output_fname, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
            )
        for _, vis_frame in demo.run_on_video(video):
            if args.output:
                writer.write(vis_frame)
        video.release()
        if args.output:
            writer.release()


if __name__ == "__main__":
    main()
