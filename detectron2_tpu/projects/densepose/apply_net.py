"""Apply Net — print / visualize DensePose results on images
(reference projects/DensePose/apply_net.py).

Actions:

* ``dump``: run a DensePose model over the input images and pickle the
  results (boxes, scores, per-detection DensePose outputs).
* ``show``: overlay any comma-separated combination of visualizations
  (``dp_contour, dp_segm, dp_u, dp_v, dp_iuv_texture, dp_vertex,
  dp_cse_texture, bbox``) on grayscale copies of the inputs.

The tool entry point lives in ``tools/densepose/apply_net.py``; this module
holds the action registry so it is importable/testable without argv
plumbing. Model execution goes through :class:`DefaultPredictor` (one jitted
program reused across images; recompiles are bounded by the
``TPU.SIZE_BUCKET`` padding quantum), and DensePose outputs reach host
``Instances`` through ``detector_postprocess``'s densepose fields.
"""

import argparse
import glob
import logging
import os
import pickle
import sys
from typing import Any, ClassVar, Dict, List

import numpy as np

__all__ = [
    "Action",
    "InferenceAction",
    "DumpAction",
    "ShowAction",
    "create_argument_parser",
    "main",
    "mesh_vertex_embeddings_from_params",
]

LOGGER_NAME = "apply_net"
logger = logging.getLogger(LOGGER_NAME)

_ACTION_REGISTRY: Dict[str, "Action"] = {}

DOC = """Apply Net - a tool to print / visualize DensePose results
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
    """Decorator for action classes to automate action registration."""
    _ACTION_REGISTRY[cls.COMMAND] = cls
    return cls


def mesh_vertex_embeddings_from_params(params, cfg) -> Dict[str, np.ndarray]:
    """mesh_name -> [K, D] vertex embeddings computed from a loaded
    parameter tree (the reference rebuilds an Embedder module and re-loads
    the checkpoint, densepose_outputs_vertex.py:57-64; here the predictor
    already holds the loaded tables, so we read them directly)."""
    from detectron2_tpu.projects.densepose.cse import (
        embedder_specs_from_cfg,
        normalize_embeddings,
    )

    import jax.numpy as jnp

    def find(tree, key):
        if not isinstance(tree, dict):
            return None
        if key in tree:
            return tree[key]
        for v in tree.values():
            hit = find(v, key)
            if hit is not None:
                return hit
        return None

    out = {}
    for name, etype, *_ in embedder_specs_from_cfg(cfg):
        sub_p = find(params.get("params", params), f"embedder_{name}")
        if sub_p is None:
            continue
        if etype == "vertex_feature":
            feats = sub_p.get("features")
            if feats is None:  # non-trainable features live in "buffers"
                sub_b = find(params.get("buffers", {}), f"embedder_{name}")
                feats = sub_b["features"] if sub_b else None
            emb = normalize_embeddings(jnp.asarray(feats) @ jnp.asarray(sub_p["embeddings"]))
        else:
            emb = normalize_embeddings(jnp.asarray(sub_p["embeddings"]))
        out[name] = np.asarray(emb)
    return out


class InferenceAction(Action):
    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        super().add_arguments(parser)
        parser.add_argument("cfg", metavar="<config>", help="Config file")
        parser.add_argument("model", metavar="<model>", help="Model file")
        parser.add_argument("input", metavar="<input>", help="Input data")
        parser.add_argument(
            "--opts",
            help="Modify config options using the command-line 'KEY VALUE' pairs",
            default=[],
            nargs=argparse.REMAINDER,
        )

    @classmethod
    def execute(cls, args: argparse.Namespace):
        from detectron2_tpu.data.detection_utils import read_image
        from detectron2_tpu.engine.defaults import DefaultPredictor

        logger.info(f"Loading config from {args.cfg}")
        cfg = cls.setup_config(args.cfg, args.model, args, [])
        logger.info(f"Loading model from {args.model}")
        predictor = DefaultPredictor(cfg)
        logger.info(f"Loading data from {args.input}")
        file_list = cls._get_input_file_list(args.input)
        if len(file_list) == 0:
            logger.warning(f"No input images for {args.input}")
            return
        context = cls.create_context(args, cfg, predictor)
        for file_name in file_list:
            img = read_image(file_name, format="BGR")  # predictor expects BGR
            outputs = predictor(img)["instances"]
            cls.execute_on_outputs(context, {"file_name": file_name, "image": img}, outputs)
        cls.postexecute(context)

    @classmethod
    def setup_config(cls, config_fpath, model_fpath, args, opts: List[str]):
        from detectron2_tpu.config import get_cfg
        from detectron2_tpu.projects.densepose import add_densepose_config

        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.merge_from_file(config_fpath)
        cfg.merge_from_list(args.opts)
        if opts:
            cfg.merge_from_list(opts)
        cfg.MODEL.WEIGHTS = model_fpath
        cfg.freeze()
        return cfg

    @classmethod
    def _get_input_file_list(cls, input_spec: str):
        if os.path.isdir(input_spec):
            file_list = [
                os.path.join(input_spec, fname)
                for fname in sorted(os.listdir(input_spec))
                if os.path.isfile(os.path.join(input_spec, fname))
            ]
        elif os.path.isfile(input_spec):
            file_list = [input_spec]
        else:
            file_list = sorted(glob.glob(input_spec))
        return file_list


@register_action
class DumpAction(InferenceAction):
    """Dump action that outputs results to a pickle file
    (reference apply_net.py:137-193; torch.save there, plain pickle of
    numpy here)."""

    COMMAND: ClassVar[str] = "dump"

    @classmethod
    def add_parser(cls, subparsers):
        parser = subparsers.add_parser(cls.COMMAND, help="Dump model outputs to a file.")
        cls.add_arguments(parser)
        parser.set_defaults(func=cls.execute)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        super().add_arguments(parser)
        parser.add_argument(
            "--output",
            metavar="<dump_file>",
            default="results.pkl",
            help="File name to save dump to",
        )

    @classmethod
    def execute_on_outputs(cls, context, entry, outputs):
        from detectron2_tpu.projects.densepose.vis import (
            DensePoseOutputsExtractor,
            DensePoseResultExtractor,
        )

        image_fpath = entry["file_name"]
        logger.info(f"Processing {image_fpath}")
        result = {"file_name": image_fpath}
        if outputs.has("scores"):
            result["scores"] = np.asarray(outputs.scores)
        if outputs.has("pred_boxes"):
            result["pred_boxes_XYXY"] = np.asarray(outputs.pred_boxes.tensor)
            if outputs.has("pred_densepose"):
                dp = outputs.pred_densepose
                if len(dp) and isinstance(dp[0], dict) and "embedding" in dp[0]:
                    result["pred_densepose"] = DensePoseOutputsExtractor()(outputs)[0]
                else:
                    result["pred_densepose"] = DensePoseResultExtractor()(outputs)[0]
        context["results"].append(result)

    @classmethod
    def create_context(cls, args, cfg, predictor):
        return {"results": [], "out_fname": args.output}

    @classmethod
    def postexecute(cls, context):
        out_fname = context["out_fname"]
        out_dir = os.path.dirname(out_fname)
        if len(out_dir) > 0 and not os.path.exists(out_dir):
            os.makedirs(out_dir)
        with open(out_fname, "wb") as f:
            pickle.dump(context["results"], f)
        logger.info(f"Output saved to {out_fname}")


@register_action
class ShowAction(InferenceAction):
    """Show action that visualizes selected entries on an image
    (reference apply_net.py:196-327)."""

    COMMAND: ClassVar[str] = "show"
    VISUALIZERS: ClassVar[Dict[str, str]] = {
        "dp_contour": "DensePoseResultsContourVisualizer",
        "dp_segm": "DensePoseResultsFineSegmentationVisualizer",
        "dp_u": "DensePoseResultsUVisualizer",
        "dp_v": "DensePoseResultsVVisualizer",
        "dp_iuv_texture": "DensePoseResultsVisualizerWithTexture",
        "dp_cse_texture": "DensePoseOutputsTextureVisualizer",
        "dp_vertex": "DensePoseOutputsVertexVisualizer",
        "bbox": "ScoredBoundingBoxVisualizer",
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
            "--min_score",
            metavar="<score>",
            default=0.8,
            type=float,
            help="Minimum detection score to visualize",
        )
        parser.add_argument(
            "--nms_thresh", metavar="<threshold>", default=None, type=float, help="NMS threshold"
        )
        parser.add_argument(
            "--texture_atlas",
            metavar="<texture_atlas>",
            default=None,
            help="Texture atlas file (for IUV texture transfer)",
        )
        parser.add_argument(
            "--texture_atlases_map",
            metavar="<texture_atlases_map>",
            default=None,
            help="JSON string of a dict containing texture atlas files for each mesh",
        )
        parser.add_argument(
            "--output",
            metavar="<image_file>",
            default="outputres.png",
            help="File name to save output to",
        )

    @classmethod
    def setup_config(cls, config_fpath, model_fpath, args, opts: List[str]):
        opts.append("MODEL.ROI_HEADS.SCORE_THRESH_TEST")
        opts.append(str(args.min_score))
        if args.nms_thresh is not None:
            opts.append("MODEL.ROI_HEADS.NMS_THRESH_TEST")
            opts.append(str(args.nms_thresh))
        return super().setup_config(config_fpath, model_fpath, args, opts)

    @classmethod
    def execute_on_outputs(cls, context, entry, outputs):
        import cv2

        visualizer = context["visualizer"]
        extractor = context["extractor"]
        image_fpath = entry["file_name"]
        logger.info(f"Processing {image_fpath}")
        image = cv2.cvtColor(entry["image"], cv2.COLOR_BGR2GRAY)
        image = np.tile(image[:, :, np.newaxis], [1, 1, 3])
        data = extractor(outputs)
        image_vis = visualizer.visualize(image, data)
        entry_idx = context["entry_idx"] + 1
        out_fname = cls._get_out_fname(entry_idx, context["out_fname"])
        out_dir = os.path.dirname(out_fname)
        if len(out_dir) > 0 and not os.path.exists(out_dir):
            os.makedirs(out_dir)
        cv2.imwrite(out_fname, image_vis)
        logger.info(f"Output saved to {out_fname}")
        context["entry_idx"] += 1

    @classmethod
    def postexecute(cls, context):
        pass

    @classmethod
    def _get_out_fname(cls, entry_idx, fname_base):
        base, ext = os.path.splitext(fname_base)
        return base + ".{0:04d}".format(entry_idx) + ext

    @classmethod
    def create_context(cls, args, cfg, predictor) -> Dict[str, Any]:
        from detectron2_tpu.projects.densepose import vis as dpvis
        from detectron2_tpu.projects.densepose.build import get_class_to_mesh_name_mapping
        from detectron2_tpu.projects.densepose.vis import (
            CompoundExtractor,
            CompoundVisualizer,
            create_extractor,
            get_texture_atlas,
            get_texture_atlases,
        )

        vis_specs = args.visualizations.split(",")
        visualizers = []
        extractors = []
        for vis_spec in vis_specs:
            vis_cls = getattr(dpvis, cls.VISUALIZERS[vis_spec])
            kwargs: Dict[str, Any] = {}
            if vis_spec in ("dp_vertex", "dp_cse_texture"):
                kwargs["class_to_mesh_name"] = get_class_to_mesh_name_mapping(cfg)
                kwargs["mesh_vertex_embeddings"] = mesh_vertex_embeddings_from_params(
                    predictor.params, cfg
                )
            if vis_spec == "dp_iuv_texture":
                kwargs["texture_atlas"] = get_texture_atlas(args.texture_atlas)
            if vis_spec == "dp_cse_texture":
                kwargs["texture_atlases_dict"] = get_texture_atlases(args.texture_atlases_map)
            vis = vis_cls(**kwargs)
            visualizers.append(vis)
            extractors.append(create_extractor(vis))
        return {
            "extractor": CompoundExtractor(extractors),
            "visualizer": CompoundVisualizer(visualizers),
            "out_fname": args.output,
            "entry_idx": 0,
        }


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
