"""DensePose trainer: DefaultTrainer + the bootstrap (pseudo-label) training
pipeline (reference projects/DensePose/densepose/engine/trainer.py:1-260).

The reference builds a second torch model on BOOTSTRAP_MODEL.DEVICE and hands
it to InferenceBasedLoader; here :func:`build_bootstrap_predictor` builds the
flax model with raw chart-map outputs enabled, loads BOOTSTRAP_MODEL.WEIGHTS,
and wraps a jitted apply + host unpadding into the ``predict_fn`` the loader
consumes. Mixing happens at the sample level so every train step sees the
same padded batch shape whatever the gt/pseudo draw is (see build.py).
"""

import logging
import os
from collections import OrderedDict
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from detectron2_tpu.engine.defaults import DefaultTrainer
from detectron2_tpu.evaluation import DatasetEvaluators
from detectron2_tpu.utils.events import EventWriter, get_event_storage

from .build import build_combined_train_loader, has_inference_based_loaders
from .dataset_mapper import DensePoseDatasetMapper

__all__ = [
    "SampleCountingLoader",
    "SampleCountMetricPrinter",
    "Trainer",
    "build_bootstrap_predictor",
]

logger = logging.getLogger(__name__)


class SampleCountingLoader:
    """Tallies per-dataset instance counts of each mixed sample batch into
    the event storage (reference trainer.py:39-61). Wraps the *uncollated*
    sample-batch stream — the padded batch dict has no per-sample dataset
    identity anymore."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        for batch in self.loader:
            try:
                storage = get_event_storage()
            except Exception:
                storage = None
            if storage is not None:
                counts: Dict[str, int] = {}
                for sample in batch:
                    name = sample.get("dataset", "gt")
                    inst = sample.get("instances")
                    counts[name] = counts.get(name, 0) + (len(inst) if inst is not None else 0)
                for name, n in counts.items():
                    storage.put_scalar(f"batch/{name}", n)
            yield batch


class SampleCountMetricPrinter(EventWriter):
    """Logs the rolling batch/<dataset> instance counts
    (reference trainer.py:64-74)."""

    def __init__(self):
        self.logger = logging.getLogger(__name__)

    def write(self):
        storage = get_event_storage()
        batch_stats_strs = []
        for key, buf in storage.histories().items():
            if key.startswith("batch/"):
                batch_stats_strs.append(f"{key} {buf.avg(20)}")
        if batch_stats_strs:
            self.logger.info(", ".join(batch_stats_strs))


def build_bootstrap_predictor(cfg, model=None, params=None) -> Callable[[List[Dict[str, Any]]], List[Dict[str, Any]]]:
    """The ``predict_fn`` for InferenceBasedLoader: a jitted forward over the
    bootstrap model emitting per-detection raw chart maps.

    Builds the model from ``cfg`` with RAW_OUTPUTS forced on (the samplers
    need full coarse/fine/u/v maps, not the argmaxed IUV stack), loads
    BOOTSTRAP_MODEL.WEIGHTS, and compiles one program per padded input shape
    (bucketed by TPU.SIZE_BUCKET, so a fixed ImageResizeTransform range
    compiles once). ``model``/``params`` injection is for tests."""
    import jax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.data.build import PaddedBatchCollator
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.structures import Boxes, Instances

    if model is None:
        bcfg = cfg.clone()
        bcfg.defrost()
        bcfg.MODEL.ROI_DENSEPOSE_HEAD.RAW_OUTPUTS = True
        model = build_model(bcfg)
    if params is None:
        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            dummy,
            train=False,
        )
        if cfg.BOOTSTRAP_MODEL.WEIGHTS:
            checkpointer = DetectionCheckpointer(params)
            checkpointer.load(cfg.BOOTSTRAP_MODEL.WEIGHTS)
            params = checkpointer.params

    collator = PaddedBatchCollator(size_divisibility=32, size_bucket=max(cfg.TPU.SIZE_BUCKET, 32))
    apply_fn = jax.jit(lambda p, b: model.apply(p, b, train=False))

    def predict_fn(batch: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        samples = [{"image": np.asarray(d["image"], np.float32)} for d in batch]
        padded = collator(samples)
        padded.pop("metadata", None)
        out = apply_fn(params, padded)
        out_np = {
            k: (
                {kk: np.asarray(vv) for kk, vv in v.items()}
                if isinstance(v, dict)
                else np.asarray(v)
            )
            for k, v in out.items()
        }
        results = []
        for i, d in enumerate(batch):
            h, w = d["image"].shape[:2]
            valid = out_np["valid"][i].astype(bool)
            idx = np.where(valid)[0]
            inst = Instances((h, w))
            boxes = out_np["pred_boxes"][i][idx].astype(np.float32)
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
            inst.pred_boxes = Boxes(boxes)
            inst.scores = out_np["scores"][i][idx].astype(np.float32)
            inst.pred_classes = out_np["pred_classes"][i][idx].astype(np.int64)
            if "pred_densepose_raw" in out_np:
                raw = out_np["pred_densepose_raw"]
                inst.pred_densepose = [{k: v[i, j] for k, v in raw.items()} for j in idx]
            results.append({"instances": inst})
        return results

    return predict_fn


class Trainer(DefaultTrainer):
    """(reference engine/trainer.py:77-260). build_train_loader composes the
    gt loader with the inference-based loaders when BOOTSTRAP_DATASETS is
    non-empty; test/TTA/evaluator plumbing matches DefaultTrainer."""

    @classmethod
    def build_train_loader(cls, cfg):
        if not has_inference_based_loaders(cfg):
            from detectron2_tpu.data.build import build_detection_train_loader

            return build_detection_train_loader(cfg, mapper=DensePoseDatasetMapper(cfg, True))
        predict_fn = build_bootstrap_predictor(cfg)
        seed = max(cfg.SEED, 0) or None
        return build_combined_train_loader(cfg, predict_fn, seed=seed, wrap=SampleCountingLoader)

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        from detectron2_tpu.data.build import build_detection_test_loader

        return build_detection_test_loader(cfg, dataset_name, mapper=DensePoseDatasetMapper(cfg, False))

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        from detectron2_tpu.evaluation import COCOEvaluator

        from .evaluation import DensePoseCOCOEvaluator, load_smpl_mesh_tables

        if output_folder is None:
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        evaluators = [COCOEvaluator(dataset_name, output_dir=output_folder)]
        if cfg.MODEL.DENSEPOSE_ON:
            # cfg.DENSEPOSE_EVALUATION.TYPE selects the reference's
            # match-quality mode (iou / gps / gpsm); "all" runs all three
            # sections like the reference evaluator does
            from .tensor_storage import build_densepose_evaluator_storage

            evaluators.append(
                DensePoseCOCOEvaluator(
                    dataset_name,
                    load_smpl_mesh_tables(),
                    mode=cfg.DENSEPOSE_EVALUATION.TYPE,
                    min_iou_threshold=cfg.DENSEPOSE_EVALUATION.MIN_IOU_THRESHOLD,
                    storage=build_densepose_evaluator_storage(
                        cfg.DENSEPOSE_EVALUATION.STORAGE, cfg.OUTPUT_DIR
                    ),
                )
            )
        return DatasetEvaluators(evaluators)

    def build_writers(self):
        writers = super().build_writers()
        writers.append(SampleCountMetricPrinter())
        return writers
