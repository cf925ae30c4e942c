#!/usr/bin/env python
"""Main training CLI for yacs configs (reference tools/train_net.py).

Example:
    python tools/train_net.py --config-file configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml
"""

import os

import detectron2_tpu.data.datasets  # noqa: register builtin datasets
from detectron2_tpu.config import get_cfg
from detectron2_tpu.data import MetadataCatalog
from detectron2_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from detectron2_tpu.evaluation import COCOEvaluator, DatasetEvaluators, verify_results
from detectron2_tpu.utils import comm


def build_evaluator(cfg, dataset_name, output_folder=None):
    """Create evaluator(s) by dataset evaluator_type metadata
    (reference train_net.py:42-79)."""
    if output_folder is None:
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
    evaluator_list = []
    evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
    if evaluator_type in ["coco", "coco_panoptic_seg"]:
        evaluator_list.append(COCOEvaluator(dataset_name, output_dir=output_folder))
    if evaluator_type == "lvis":
        from detectron2_tpu.evaluation.lvis_evaluation import LVISEvaluator

        return LVISEvaluator(dataset_name, output_dir=output_folder)
    if evaluator_type == "pascal_voc":
        from detectron2_tpu.evaluation.pascal_voc_evaluation import PascalVOCDetectionEvaluator

        return PascalVOCDetectionEvaluator(dataset_name)
    if len(evaluator_list) == 0:
        raise NotImplementedError(
            f"no Evaluator for the dataset {dataset_name} with the type {evaluator_type}"
        )
    if len(evaluator_list) == 1:
        return evaluator_list[0]
    return DatasetEvaluators(evaluator_list)


class Trainer(DefaultTrainer):
    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        return build_evaluator(cfg, dataset_name, output_folder)


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)

    if args.eval_only:
        import jax
        import numpy as np

        from detectron2_tpu.checkpoint import DetectionCheckpointer
        from detectron2_tpu.modeling import build_model

        model = build_model(cfg)
        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, dummy, train=False
        )
        checkpointer = DetectionCheckpointer(params, save_dir=cfg.OUTPUT_DIR)
        checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        res = Trainer.test(cfg, model, params=checkpointer.params)
        if comm.is_main_process():
            verify_results(cfg, res)
        return res

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


def invoke_main() -> None:
    args = default_argument_parser().parse_args()
    launch(
        main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )


if __name__ == "__main__":
    invoke_main()
