"""Query DB — print / visualize entries of a registered DensePose dataset
(reference projects/DensePose/query_db.py).

Actions:

* ``print``: pretty-print dataset entries matching a selector.
* ``show``: overlay GT annotations (``dp_segm, dp_i, dp_u, dp_v, dp_pts,
  bbox``) on grayscale copies of the entry images.

The selector grammar is :class:`~.dbhelper.EntrySelector`'s — e.g.
``image_id:int=18-25`` or ``*``. The tool entry point lives in
``tools/densepose/query_db.py``.
"""

import argparse
import logging
import os
import sys
from timeit import default_timer as timer
from typing import Any, ClassVar, Dict, List

__all__ = ["create_argument_parser", "main"]

LOGGER_NAME = "query_db"
logger = logging.getLogger(LOGGER_NAME)

_ACTION_REGISTRY: Dict[str, "Action"] = {}

DOC = """Query DB - a tool to print / visualize data from a database
"""


class Action:
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        parser.add_argument(
            "-v",
            "--verbosity",
            action="count",
            help="Verbose mode. Multiple -v options increase the verbosity.",
        )


def register_action(cls):
    _ACTION_REGISTRY[cls.COMMAND] = cls
    return cls


def setup_dataset(dataset_name):
    from detectron2_tpu.data.catalog import DatasetCatalog

    logger.info(f"Loading dataset {dataset_name}")
    start = timer()
    dataset = DatasetCatalog.get(dataset_name)
    stop = timer()
    logger.info("Loaded dataset {} in {:.3f}s".format(dataset_name, stop - start))
    return dataset


class EntrywiseAction(Action):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        super().add_arguments(parser)
        parser.add_argument(
            "dataset", metavar="<dataset>", help="Dataset name (e.g. densepose_coco_2014_train)"
        )
        parser.add_argument(
            "selector",
            metavar="<selector>",
            help="Dataset entry selector in the form field1[:type]=value1[,"
            "field2[:type]=value_min-value_max...] which selects all "
            "entries from the dataset that satisfy the constraints",
        )
        parser.add_argument(
            "--max-entries", metavar="N", help="Maximum number of entries to process", type=int
        )

    @classmethod
    def execute(cls, args: argparse.Namespace):
        from detectron2_tpu.projects.densepose.dbhelper import EntrySelector

        dataset = setup_dataset(args.dataset)
        entry_selector = EntrySelector.from_string(args.selector)
        context = cls.create_context(args)
        if args.max_entries is not None:
            for _, entry in zip(range(args.max_entries), dataset):
                if entry_selector(entry):
                    cls.execute_on_entry(entry, context)
        else:
            for entry in dataset:
                if entry_selector(entry):
                    cls.execute_on_entry(entry, context)

    @classmethod
    def create_context(cls, args: argparse.Namespace) -> Dict[str, Any]:
        return {}


@register_action
class PrintAction(EntrywiseAction):
    """Print action that outputs selected entries to stdout
    (reference query_db.py:98-119)."""

    COMMAND: ClassVar[str] = "print"

    @classmethod
    def add_parser(cls, subparsers):
        parser = subparsers.add_parser(cls.COMMAND, help="Output selected entries to stdout. ")
        cls.add_arguments(parser)
        parser.set_defaults(func=cls.execute)

    @classmethod
    def execute_on_entry(cls, entry: Dict[str, Any], context: Dict[str, Any]):
        import pprint

        printer = pprint.PrettyPrinter(indent=2, width=200, compact=True)
        printer.pprint(entry)


@register_action
class ShowAction(EntrywiseAction):
    """Show action that visualizes selected entries on an image
    (reference query_db.py:122-219)."""

    COMMAND: ClassVar[str] = "show"
    VISUALIZERS: ClassVar[Dict[str, str]] = {
        "dp_segm": "DensePoseDataCoarseSegmentationVisualizer",
        "dp_i": "DensePoseDataPointsIVisualizer",
        "dp_u": "DensePoseDataPointsUVisualizer",
        "dp_v": "DensePoseDataPointsVVisualizer",
        "dp_pts": "DensePoseDataPointsVisualizer",
        "bbox": "BoundingBoxVisualizer",
    }

    @classmethod
    def add_parser(cls, subparsers):
        parser = subparsers.add_parser(cls.COMMAND, help="Visualize selected entries")
        cls.add_arguments(parser)
        parser.set_defaults(func=cls.execute)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        super().add_arguments(parser)
        parser.add_argument(
            "visualizations",
            metavar="<visualizations>",
            help="Comma separated list of visualizations, possible values: "
            "[{}]".format(",".join(sorted(cls.VISUALIZERS.keys()))),
        )
        parser.add_argument(
            "--output",
            metavar="<image_file>",
            default="output.png",
            help="File name to save output to",
        )

    @classmethod
    def execute_on_entry(cls, entry: Dict[str, Any], context: Dict[str, Any]):
        import cv2
        import numpy as np

        image_fpath = entry["file_name"]
        image = cv2.imread(image_fpath, cv2.IMREAD_GRAYSCALE)
        image = np.tile(image[:, :, np.newaxis], [1, 1, 3])
        datas = cls._extract_data_for_visualizers_from_entry(context["vis_specs"], entry)
        visualizer = context["visualizer"]
        image_vis = visualizer.visualize(image, datas)
        entry_idx = context["entry_idx"] + 1
        out_fname = cls._get_out_fname(entry_idx, context["out_fname"])
        cv2.imwrite(out_fname, image_vis)
        logger.info(f"Output saved to {out_fname}")
        context["entry_idx"] += 1

    @classmethod
    def _get_out_fname(cls, entry_idx, fname_base):
        base, ext = os.path.splitext(fname_base)
        return base + ".{0:04d}".format(entry_idx) + ext

    @classmethod
    def create_context(cls, args: argparse.Namespace) -> Dict[str, Any]:
        from detectron2_tpu.projects.densepose import vis as dpvis
        from detectron2_tpu.projects.densepose.vis import CompoundVisualizer

        vis_specs = args.visualizations.split(",")
        visualizers = [getattr(dpvis, cls.VISUALIZERS[spec])() for spec in vis_specs]
        return {
            "vis_specs": vis_specs,
            "visualizer": CompoundVisualizer(visualizers),
            "out_fname": args.output,
            "entry_idx": 0,
        }

    @classmethod
    def _extract_data_for_visualizers_from_entry(cls, vis_specs: List[str], entry):
        import numpy as np

        from detectron2_tpu.projects.densepose.structures import DensePoseDataRelative

        dp_list = []
        bbox_list = []
        for annotation in entry["annotations"]:
            is_valid, _ = DensePoseDataRelative.validate_annotation(annotation)
            if not is_valid:
                continue
            bbox_list.append(np.asarray(annotation["bbox"], np.float32))
            dp_list.append(DensePoseDataRelative(annotation))
        return [
            bbox_list if "bbox" == vis_spec else (bbox_list, dp_list) for vis_spec in vis_specs
        ]


def create_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=DOC,
        formatter_class=lambda prog: argparse.HelpFormatter(prog, max_help_position=120),
    )
    parser.set_defaults(func=lambda _: parser.print_help(sys.stdout))
    subparsers = parser.add_subparsers(title="Actions")
    for _, action in _ACTION_REGISTRY.items():
        action.add_parser(subparsers)
    return parser


def main(argv=None):
    from detectron2_tpu.projects.densepose.dbhelper import verbosity_to_level
    from detectron2_tpu.utils.logger import setup_logger

    parser = create_argument_parser()
    args = parser.parse_args(argv)
    verbosity = getattr(args, "verbosity", None)
    global logger
    logger = setup_logger(name=LOGGER_NAME)
    logger.setLevel(verbosity_to_level(verbosity))
    args.func(args)
