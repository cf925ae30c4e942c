#!/usr/bin/env python
"""DensePose training CLI (reference projects/DensePose/train_net.py).

Same surface as tools/train_net.py but routed through the DensePose Trainer
(bootstrap-aware train loader, DensePose mapper, GPS/GPSM/segm evaluator)
and add_densepose_config.

Example:
    python tools/densepose/train_net.py \
        --config-file configs/DensePose/densepose_rcnn_R_50_FPN_s1x.yaml
"""

import detectron2_tpu.data.datasets  # noqa: register builtin datasets
from detectron2_tpu.config import get_cfg
from detectron2_tpu.engine import default_argument_parser, default_setup, launch
from detectron2_tpu.evaluation import verify_results
from detectron2_tpu.projects.densepose import add_densepose_config
from detectron2_tpu.projects.densepose.trainer import Trainer
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.logger import setup_logger


def setup(args):
    cfg = get_cfg()
    add_densepose_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    # separate logger for the densepose project, like the reference
    # (train_net.py:34)
    setup_logger(output=cfg.OUTPUT_DIR, distributed_rank=comm.get_rank(), name="densepose")
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
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            dummy,
            train=False,
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
