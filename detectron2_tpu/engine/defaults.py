"""Default trainer / predictor / CLI plumbing (reference detectron2/engine/defaults.py).

DefaultTrainer owns the whole TPU training setup: build model (flax module) →
init params → optax optimizer → compiled SPMD train step over the device mesh
→ SimpleTrainer loop with the standard hook stack. DefaultPredictor wraps a
model + weights into a single-image callable with the reference's
ResizeShortestEdge preprocessing.
"""

import argparse
import logging
import os
import sys
import weakref
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

import jax

from detectron2_tpu.config import CfgNode
from detectron2_tpu.data import (
    MetadataCatalog,
    PaddedBatchCollator,
    build_detection_test_loader,
    build_detection_train_loader,
)
from detectron2_tpu.data import transforms as T
from detectron2_tpu.engine import hooks
from detectron2_tpu.engine.train_loop import SimpleTrainer, TrainerBase
from detectron2_tpu.evaluation import (
    DatasetEvaluator,
    inference_on_dataset,
    print_csv_format,
    verify_results,
)
from detectron2_tpu.checkpoint import DetectionCheckpointer
from detectron2_tpu.modeling import build_model
from detectron2_tpu.parallel import (
    TrainState,
    apply_param_layout,
    create_mesh,
    make_eval_step,
    make_train_step,
)
from detectron2_tpu.solver import build_lr_scheduler, build_optimizer
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.env import seed_all_rng
from detectron2_tpu.utils.events import CommonMetricPrinter, JSONWriter
from detectron2_tpu.utils.file_io import PathManager
from detectron2_tpu.utils.logger import setup_logger

__all__ = [
    "create_ddp_model",
    "default_argument_parser",
    "default_setup",
    "default_writers",
    "DefaultPredictor",
    "DefaultTrainer",
]


def create_ddp_model(model, **kwargs):
    """API-parity shim: data parallelism in this framework comes from the
    mesh-sharded compiled step (parallel.make_train_step), not from a model
    wrapper (reference defaults.py:60-79 wraps in DDP)."""
    return model


def default_argument_parser(epilog=None) -> argparse.ArgumentParser:
    """Create a parser with the standard flags (reference defaults.py:82)."""
    parser = argparse.ArgumentParser(
        epilog=epilog
        or """Examples:\n  python tools/train_net.py --config-file cfg.yaml --eval-only MODEL.WEIGHTS /path/to/weights.ckpt""",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--config-file", default="", metavar="FILE", help="path to config file")
    parser.add_argument("--resume", action="store_true", help="resume from the checkpoint directory if any")
    parser.add_argument("--eval-only", action="store_true", help="perform evaluation only")
    # kept for CLI compatibility; jax discovers local devices automatically
    parser.add_argument("--num-gpus", type=int, default=1, help="(compat) devices per machine; jax auto-detects")
    parser.add_argument("--num-machines", type=int, default=1, help="total number of host processes")
    parser.add_argument("--machine-rank", type=int, default=0, help="the rank of this machine")
    parser.add_argument("--dist-url", default="auto", help="coordinator address for jax.distributed")
    parser.add_argument(
        "opts",
        help="Modify config options at the end of the command, using space-separated 'PATH.KEY VALUE' pairs",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def default_setup(cfg, args) -> None:
    """Perform common setup: logging, seeding, config dump
    (reference defaults.py:198)."""
    output_dir = cfg.OUTPUT_DIR
    if comm.is_main_process() and output_dir:
        PathManager.mkdirs(output_dir)

    rank = comm.get_rank()
    setup_logger(output_dir, distributed_rank=rank, name="detectron2_tpu")
    logger = setup_logger(output_dir, distributed_rank=rank)

    logger.info(f"Rank of current process: {rank}. World size: {comm.get_world_size()}")
    logger.info(f"jax devices: {jax.device_count()} ({jax.default_backend()})")
    logger.info("Command line arguments: " + str(args))
    if hasattr(args, "config_file") and args.config_file != "":
        logger.info(f"Contents of args.config_file={args.config_file}")

    if comm.is_main_process() and output_dir:
        path = os.path.join(output_dir, "config.yaml")
        if isinstance(cfg, CfgNode):
            with PathManager.open(path, "w") as f:
                f.write(cfg.dump())
        else:
            from detectron2_tpu.config import LazyConfig

            LazyConfig.save(cfg, path)
        logger.info("Full config saved to {}".format(path))

    seed = cfg.SEED if isinstance(cfg, CfgNode) else cfg.get("train", {}).get("seed", -1)
    seed_all_rng(None if seed < 0 else seed + rank)

    # persistent XLA compilation cache
    if isinstance(cfg, CfgNode) and cfg.TPU.COMPILE_CACHE:
        jax.config.update("jax_compilation_cache_dir", cfg.TPU.COMPILE_CACHE)


def default_writers(output_dir: str, max_iter: Optional[int] = None):
    """The default metric writers (reference defaults.py:262)."""
    PathManager.mkdirs(output_dir)
    writers = [
        CommonMetricPrinter(max_iter),
        JSONWriter(os.path.join(output_dir, "metrics.json")),
    ]
    try:
        from detectron2_tpu.utils.events import TensorboardXWriter

        writers.append(TensorboardXWriter(output_dir))
    except Exception:
        pass
    return writers


class DefaultPredictor:
    """Single-image inference with a given config (reference defaults.py:284):
    loads weights, applies the test-time ResizeShortestEdge + BGR handling,
    returns one "instances" dict per call.

    The compiled program is cached per padded input shape; the ``TPU.
    SIZE_BUCKET`` quantum bounds recompiles across image sizes.
    """

    def __init__(self, cfg):
        self.cfg = cfg.clone()
        self.model = build_model(self.cfg)

        self.aug = T.ResizeShortestEdge(
            [cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MIN_SIZE_TEST], cfg.INPUT.MAX_SIZE_TEST
        )
        self.input_format = cfg.INPUT.FORMAT
        assert self.input_format in ["RGB", "BGR"], self.input_format

        self.collator = PaddedBatchCollator(
            size_divisibility=32, size_bucket=max(cfg.TPU.SIZE_BUCKET, 32)
        )

        # init params with a small dummy batch, then load weights
        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        self.params = self.model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, dummy, train=False
        )
        if cfg.MODEL.WEIGHTS:
            checkpointer = DetectionCheckpointer(self.params)
            checkpointer.load(cfg.MODEL.WEIGHTS)
            self.params = checkpointer.params

        self._predict = jax.jit(lambda p, b: self.model.apply(p, b, train=False))

    def __call__(self, original_image: np.ndarray) -> Dict:
        """
        Args:
            original_image: HWC uint8 image in BGR order (OpenCV convention).

        Returns:
            dict with "instances": host Instances at original resolution.
        """
        from detectron2_tpu.modeling.postprocessing import detector_postprocess

        if self.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        height, width = original_image.shape[:2]
        image = self.aug.get_transform(original_image).apply_image(original_image)
        batch = self.collator([{"image": image.astype(np.float32)}])
        batch.pop("metadata")

        outputs = self._predict(self.params, batch)
        out_np = {
            # nested dicts (e.g. DensePose RAW_OUTPUTS chart maps) slice per key
            k: (
                {kk: np.asarray(vv)[0] for kk, vv in v.items()}
                if isinstance(v, dict)
                else np.asarray(v)[0]
            )
            for k, v in outputs.items()
        }
        in_h, in_w = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
        instances = detector_postprocess(out_np, height, width, in_h, in_w)
        return {"instances": instances}


class DefaultTrainer(TrainerBase):
    """A trainer with default behavior (reference defaults.py:355-751):
    model/optimizer/loader from config, the standard hook stack, checkpoint
    resume, and the test() loop over cfg.DATASETS.TEST."""

    def __init__(self, cfg):
        super().__init__()
        logger = logging.getLogger("detectron2_tpu")
        if not logger.isEnabledFor(logging.INFO):
            setup_logger()
        cfg = DefaultTrainer.auto_scale_workers(cfg, comm.get_world_size())
        self.cfg = cfg

        model = self.build_model(cfg)
        data_loader = self.build_train_loader(cfg)

        # initialize parameters on one tiny batch
        init_rngs = {"params": jax.random.PRNGKey(max(cfg.SEED, 0)), "sampling": jax.random.PRNGKey(1)}
        first = next(iter(data_loader)) if not hasattr(data_loader, "peek") else data_loader.peek()
        init_batch = {k: v for k, v in first.items() if k != "metadata"}
        params = model.init(init_rngs, init_batch, train=True)

        tx = self.build_optimizer(cfg, params)
        state = TrainState.create(params, tx)

        self.mesh = create_mesh(data=cfg.TPU.MESH_DATA, model=cfg.TPU.MESH_MODEL)
        state, state_shardings = apply_param_layout(cfg.TPU.PARAM_LAYOUT, state, self.mesh)
        train_step = make_train_step(model, mesh=self.mesh, state_shardings=state_shardings)

        self.model = model
        self._trainer = SimpleTrainer(
            train_step, data_loader, state, rng=jax.random.PRNGKey(max(cfg.SEED, 0) + 7)
        )
        self._first_batch = first

        self.scheduler = self.build_lr_scheduler(cfg)
        self.checkpointer = DetectionCheckpointer(
            state,
            cfg.OUTPUT_DIR,
            trainer=weakref.proxy(self),
        )
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER

        self.register_hooks(self.build_hooks())

    # --------------------------------------------------------------- builds
    @classmethod
    def build_model(cls, cfg):
        model = build_model(cfg)
        logging.getLogger(__name__).info("Model:\n{}".format(model))
        return model

    @classmethod
    def build_optimizer(cls, cfg, params):
        return build_optimizer(cfg, params)

    @classmethod
    def build_lr_scheduler(cls, cfg, optimizer=None):
        return build_lr_scheduler(cfg)

    @classmethod
    def build_train_loader(cls, cfg):
        return build_detection_train_loader(cfg)

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        return build_detection_test_loader(cfg, dataset_name)

    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        raise NotImplementedError(
            "If you want DefaultTrainer to automatically run evaluation, "
            "please implement `build_evaluator()` in subclasses (see train_net.py for example)."
        )

    def build_hooks(self) -> List:
        """The default hook stack (reference defaults.py:452-500)."""
        cfg = self.cfg

        ret = [
            hooks.IterationTimer(),
            hooks.LRScheduler(self.scheduler),
        ]

        def _sync_state_then(cp):
            cp.params = self._trainer.state
            return cp

        if comm.is_main_process():
            ret.append(
                hooks.PeriodicCheckpointer(
                    self.checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, max_iter=self.max_iter
                )
            )

        def test_and_save_results():
            self._last_eval_results = self.test(self.cfg, self.model, params=self._trainer.state.params)
            return self._last_eval_results

        ret.append(hooks.EvalHook(cfg.TEST.EVAL_PERIOD, test_and_save_results))

        if comm.is_main_process():
            ret.append(hooks.PeriodicWriter(self.build_writers(), period=20))
        return ret

    def build_writers(self):
        return default_writers(self.cfg.OUTPUT_DIR, self.max_iter)

    # --------------------------------------------------------------- running
    def resume_or_load(self, resume: bool = True):
        self.checkpointer.params = self._trainer.state
        extra = self.checkpointer.resume_or_load(self.cfg.MODEL.WEIGHTS, resume=resume)
        self._trainer.state = self.checkpointer.params
        if resume and self.checkpointer.has_checkpoint():
            self.start_iter = extra.get("iteration", -1) + 1

    def train(self):
        super().train(self.start_iter, self.max_iter)
        if len(self.cfg.TEST.EXPECTED_RESULTS) and comm.is_main_process():
            assert hasattr(self, "_last_eval_results"), "No evaluation results obtained during training!"
            verify_results(self.cfg, self._last_eval_results)
            return self._last_eval_results

    def run_step(self):
        self._trainer.iter = self.iter
        self._trainer.run_step()

    def after_train(self):
        self._trainer.after_train()
        super().after_train()

    def state_dict(self):
        ret = super().state_dict()
        ret["_trainer"] = self._trainer.state_dict()
        return ret

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        self._trainer.load_state_dict(state_dict["_trainer"])

    @property
    def state(self):
        return self._trainer.state

    @classmethod
    def test(cls, cfg, model, evaluators=None, params=None) -> Dict:
        """Evaluate on cfg.DATASETS.TEST (reference defaults.py:612-666)."""
        logger = logging.getLogger(__name__)
        if isinstance(evaluators, DatasetEvaluator):
            evaluators = [evaluators]
        if evaluators is not None:
            assert len(cfg.DATASETS.TEST) == len(evaluators), f"{len(cfg.DATASETS.TEST)} != {len(evaluators)}"

        eval_fn = jax.jit(lambda p, b: model.apply(p, b, train=False))

        results = OrderedDict()
        for idx, dataset_name in enumerate(cfg.DATASETS.TEST):
            data_loader = cls.build_test_loader(cfg, dataset_name)
            if evaluators is not None:
                evaluator = evaluators[idx]
            else:
                try:
                    evaluator = cls.build_evaluator(cfg, dataset_name)
                except NotImplementedError:
                    logger.warning(
                        "No evaluator found. Use `DefaultTrainer.test(evaluators=)`, "
                        "or implement its `build_evaluator` method."
                    )
                    results[dataset_name] = {}
                    continue

            def predict(batch, _params=params):
                clean = {k: v for k, v in batch.items() if k != "metadata"}
                return eval_fn(_params, clean)

            results_i = inference_on_dataset(predict, data_loader, evaluator)
            results[dataset_name] = results_i
            if comm.is_main_process():
                assert isinstance(results_i, dict), (
                    f"Evaluator must return a dict on the main process. Got {results_i} instead."
                )
                logger.info(f"Evaluation results for {dataset_name} in csv format:")
                print_csv_format(results_i)

        if len(results) == 1:
            results = list(results.values())[0]
        return results

    @staticmethod
    def auto_scale_workers(cfg, num_workers: int):
        """Linearly scale the config to the number of host processes
        (reference defaults.py:668-737)."""
        old_world_size = cfg.SOLVER.REFERENCE_WORLD_SIZE
        if old_world_size == 0 or old_world_size == num_workers:
            return cfg
        cfg = cfg.clone()
        frozen = cfg.is_frozen()
        cfg.defrost()

        assert cfg.SOLVER.IMS_PER_BATCH % old_world_size == 0, (
            "Invalid REFERENCE_WORLD_SIZE in config!"
        )
        scale = num_workers / old_world_size
        bs = cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
        lr = cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
        max_iter = cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
        warmup_iter = cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
        cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
        cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
        cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
        cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
        logger = logging.getLogger(__name__)
        logger.info(
            f"Auto-scaling the config to batch_size={bs}, learning_rate={lr}, "
            f"max_iter={max_iter}, warmup={warmup_iter}."
        )
        if frozen:
            cfg.freeze()
        return cfg
