#!/usr/bin/env python
"""Benchmark train / eval / data-loading throughput
(reference tools/benchmark.py)."""

import itertools
import time

import jax
import numpy as np

import detectron2_tpu.data.datasets  # noqa
from detectron2_tpu.config import get_cfg
from detectron2_tpu.data import build_detection_test_loader, build_detection_train_loader
from detectron2_tpu.engine import default_argument_parser
from detectron2_tpu.modeling import build_model
from detectron2_tpu.parallel import TrainState, create_mesh, make_train_step, replicate
from detectron2_tpu.solver import build_optimizer
from detectron2_tpu.utils.events import EventStorage


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def benchmark_data(args):
    cfg = setup(args)
    loader = build_detection_train_loader(cfg)
    itr = iter(loader)
    for _ in range(5):  # warmup
        next(itr)
    timer = time.perf_counter()
    max_iter = 100
    for _ in range(max_iter):
        next(itr)
    dt = time.perf_counter() - timer
    print(f"data loading: {max_iter / dt:.2f} batches/s ({cfg.SOLVER.IMS_PER_BATCH * max_iter / dt:.1f} img/s)")


def benchmark_train(args):
    cfg = setup(args)
    model = build_model(cfg)
    loader = build_detection_train_loader(cfg)
    itr = iter(loader)
    first = next(itr)
    init_batch = {k: v for k, v in first.items() if k != "metadata"}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, init_batch, train=True
    )
    tx = build_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    mesh = create_mesh()
    state = replicate(state, mesh)
    step = make_train_step(model, mesh=mesh)
    rng = jax.random.PRNGKey(0)

    with EventStorage():
        state, losses = step(state, init_batch, rng)  # compile
        float(np.asarray(losses["total_loss"]))
        timer = time.perf_counter()
        n = 20
        for i in range(n):
            batch = next(itr)
            batch.pop("metadata", None)
            state, losses = step(state, batch, jax.random.fold_in(rng, i))
        float(np.asarray(losses["total_loss"]))
        dt = time.perf_counter() - timer
    print(f"train: {dt / n:.4f} s/iter ({cfg.SOLVER.IMS_PER_BATCH * n / dt:.1f} img/s)")


def benchmark_eval(args):
    cfg = setup(args)
    model = build_model(cfg)
    loader = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0])
    itr = iter(loader)
    first = next(itr)
    clean = {k: v for k, v in first.items() if k != "metadata"}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, clean, train=False
    )
    fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))
    out = fwd(params, clean)  # compile
    float(np.asarray(out["scores"]).sum())

    timer = time.perf_counter()
    n = 0
    for batch in itertools.islice(itr, 50):
        meta = batch.pop("metadata")
        out = fwd(params, batch)
        n += len(meta)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - timer
    print(f"eval: {dt / max(n, 1):.4f} s/img ({n / dt:.1f} img/s)")


if __name__ == "__main__":
    parser = default_argument_parser(epilog="--task data|train|eval")
    parser.add_argument("--task", choices=["train", "eval", "data"], required=True)
    args = parser.parse_args()
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](args)
