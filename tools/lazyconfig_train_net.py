#!/usr/bin/env python
"""Training CLI for LazyConfig python configs
(reference tools/lazyconfig_train_net.py): explicit do_train/do_test with
instantiate()."""

import logging

import jax

from detectron2_tpu.config import LazyConfig, instantiate
from detectron2_tpu.engine import (
    SimpleTrainer,
    default_argument_parser,
    default_setup,
    default_writers,
    hooks,
    launch,
)
from detectron2_tpu.engine.defaults import create_ddp_model
from detectron2_tpu.checkpoint import DetectionCheckpointer
from detectron2_tpu.evaluation import inference_on_dataset, print_csv_format
from detectron2_tpu.parallel import TrainState, create_mesh, make_train_step, replicate
from detectron2_tpu.utils import comm

logger = logging.getLogger("detectron2_tpu")


def do_test(cfg, model, params):
    if "evaluator" in cfg.dataloader:
        fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))

        def predict(batch):
            clean = {k: v for k, v in batch.items() if k != "metadata"}
            return fwd(params, clean)

        ret = inference_on_dataset(
            predict, instantiate(cfg.dataloader.test), instantiate(cfg.dataloader.evaluator)
        )
        print_csv_format(ret)
        return ret


def do_train(args, cfg):
    model = instantiate(cfg.model)
    logger.info("Model:\n{}".format(model))

    train_loader = instantiate(cfg.dataloader.train)

    first = next(iter(train_loader))
    init_batch = {k: v for k, v in first.items() if k != "metadata"}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, init_batch, train=True
    )

    cfg.optimizer.params = params
    optim = instantiate(cfg.optimizer)
    state = TrainState.create(params, optim)

    mesh = create_mesh()
    state = replicate(state, mesh)
    step = make_train_step(model, mesh=mesh)

    trainer = SimpleTrainer(step, train_loader, state)
    checkpointer = DetectionCheckpointer(state, cfg.train.output_dir, trainer=trainer)
    trainer.register_hooks(
        [
            hooks.IterationTimer(),
            hooks.LRScheduler(instantiate(cfg.lr_multiplier)) if "lr_multiplier" in cfg else None,
            hooks.PeriodicCheckpointer(checkpointer, cfg.train.checkpointer.period)
            if comm.is_main_process()
            else None,
            hooks.EvalHook(cfg.train.eval_period, lambda: do_test(cfg, model, trainer.state.params)),
            hooks.PeriodicWriter(
                default_writers(cfg.train.output_dir, cfg.train.max_iter),
                period=cfg.train.log_period,
            )
            if comm.is_main_process()
            else None,
        ]
    )

    checkpointer.resume_or_load(cfg.train.init_checkpoint, resume=args.resume)
    start_iter = 0
    trainer.train(start_iter, cfg.train.max_iter)


def main(args):
    cfg = LazyConfig.load(args.config_file)
    cfg = LazyConfig.apply_overrides(cfg, args.opts)
    default_setup(cfg, args)

    if args.eval_only:
        model = instantiate(cfg.model)
        import numpy as np

        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, dummy, train=False
        )
        checkpointer = DetectionCheckpointer(params)
        checkpointer.load(cfg.train.init_checkpoint)
        print(do_test(cfg, model, checkpointer.params))
    else:
        do_train(args, cfg)


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
