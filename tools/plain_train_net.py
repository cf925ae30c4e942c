#!/usr/bin/env python
"""Training script with a plainly written loop, documenting the minimal API
(reference tools/plain_train_net.py): no Trainer/hooks — build model, loader,
optimizer, compiled step, and loop.
"""

import logging
import os

import jax
import numpy as np

import detectron2_tpu.data.datasets  # noqa: register builtin datasets
from detectron2_tpu.checkpoint import DetectionCheckpointer, PeriodicCheckpointer
from detectron2_tpu.config import get_cfg
from detectron2_tpu.data import MetadataCatalog, build_detection_test_loader, build_detection_train_loader
from detectron2_tpu.engine import default_argument_parser, default_setup, default_writers, launch
from detectron2_tpu.evaluation import COCOEvaluator, inference_on_dataset, print_csv_format
from detectron2_tpu.modeling import build_model
from detectron2_tpu.parallel import TrainState, create_mesh, make_train_step, replicate, shard_batch
from detectron2_tpu.solver import build_lr_scheduler, build_optimizer
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.events import EventStorage

logger = logging.getLogger("detectron2_tpu")


def get_evaluator(cfg, dataset_name, output_folder=None):
    if output_folder is None:
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
    evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
    if evaluator_type == "coco":
        return COCOEvaluator(dataset_name, output_dir=output_folder)
    raise NotImplementedError(evaluator_type)


def do_test(cfg, model, params):
    results = {}
    eval_fn = jax.jit(lambda p, b: model.apply(p, b, train=False))
    for dataset_name in cfg.DATASETS.TEST:
        data_loader = build_detection_test_loader(cfg, dataset_name)
        evaluator = get_evaluator(cfg, dataset_name)

        def predict(batch):
            clean = {k: v for k, v in batch.items() if k != "metadata"}
            return eval_fn(params, clean)

        results_i = inference_on_dataset(predict, data_loader, evaluator)
        results[dataset_name] = results_i
        if comm.is_main_process():
            logger.info("Evaluation results for {} in csv format:".format(dataset_name))
            print_csv_format(results_i)
    if len(results) == 1:
        results = list(results.values())[0]
    return results


def do_train(cfg, model, resume=False):
    data_loader = build_detection_train_loader(cfg)
    first = next(iter(data_loader))
    init_batch = {k: v for k, v in first.items() if k != "metadata"}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, init_batch, train=True
    )
    tx = build_optimizer(cfg, params)
    state = TrainState.create(params, tx)

    mesh = create_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
    state = replicate(state, mesh)
    train_step = make_train_step(model, mesh=mesh)
    schedule = build_lr_scheduler(cfg)

    max_iter = cfg.SOLVER.MAX_ITER
    checkpointer = DetectionCheckpointer(state, cfg.OUTPUT_DIR)
    start_iter = 0
    if resume and checkpointer.has_checkpoint():
        extra = checkpointer.resume_or_load("", resume=True)
        state = checkpointer.params
        start_iter = extra.get("iteration", -1) + 1
    elif cfg.MODEL.WEIGHTS:
        checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=False)
        state = checkpointer.params

    periodic_checkpointer = PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, max_iter=max_iter)
    writers = default_writers(cfg.OUTPUT_DIR, max_iter) if comm.is_main_process() else []

    logger.info("Starting training from iteration {}".format(start_iter))
    rng = jax.random.PRNGKey(7)
    data_iter = iter(data_loader)
    with EventStorage(start_iter) as storage:
        for iteration in range(start_iter, max_iter):
            storage.iter = iteration
            batch = next(data_iter)
            batch.pop("metadata", None)
            state, losses = train_step(state, batch, jax.random.fold_in(rng, iteration))

            if comm.is_main_process() and (iteration % 20 == 19 or iteration == max_iter - 1):
                metrics = {k: float(np.asarray(v)) for k, v in losses.items()}
                storage.put_scalars(**metrics, smoothing_hint=False)
                storage.put_scalar("lr", float(schedule(iteration)), smoothing_hint=False)
                for writer in writers:
                    writer.write()

            if cfg.TEST.EVAL_PERIOD > 0 and (iteration + 1) % cfg.TEST.EVAL_PERIOD == 0 and iteration != max_iter - 1:
                do_test(cfg, model, state.params)
                comm.synchronize()

            checkpointer.params = state
            periodic_checkpointer.step(iteration)


def setup(args):
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)
    model = build_model(cfg)

    if args.eval_only:
        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, dummy, train=False
        )
        checkpointer = DetectionCheckpointer(params, save_dir=cfg.OUTPUT_DIR)
        checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        return do_test(cfg, model, checkpointer.params)

    do_train(cfg, model, resume=args.resume)
    return None


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, num_machines=args.num_machines, machine_rank=args.machine_rank, dist_url=args.dist_url, args=(args,))
