"""DensePose bootstrapping: pseudo-labeling machinery that turns model
predictions into training annotations.

Re-designs the reference's bootstrapping pipeline for this framework's
host-side data model (numpy annotations feeding the padded batch collator):

- samplers (reference densepose/data/samplers/densepose_base.py:16-205,
  densepose_uniform.py:11-43, densepose_confidence_based.py:14-110,
  mask_from_densepose.py:10-30): draw sparse DensePose point supervision and
  coarse masks from dense chart predictions;
- PredictionToGroundTruthSampler (reference samplers/prediction_to_gt.py:
  29-100): field-level prediction -> GT remapping registry;
- ScoreBasedFilter + InferenceBasedLoader (reference
  inference_based_loader.py:35-174): run a (jitted) predictor over unlabeled
  image batches and emit pseudo-labeled training samples.

The video-IO pipelines (reference densepose/data/video/) stay out of scope:
they read external video datasets this environment cannot host. The samplers
and the loader below are the dataset-agnostic core that those pipelines feed.

Prediction format: each detection's ``pred_densepose`` entry is a dict of
channel-last [S, S, C] chart maps (coarse_segm / fine_segm / u / v, plus
optional confidence channels) — the framework's padded device outputs sliced
per detection (see vis.DensePoseResultExtractor).
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from detectron2_tpu.structures import BoxMode, Instances

from .converters import (
    ToChartResultConverter,
    ToChartResultConverterWithConfidences,
    ToMaskConverter,
    _resize_chw,
    make_int_box,
)
from .structures import DensePoseDataRelative, DensePoseList

__all__ = [
    "FINE_TO_COARSE_SEGMENTATION",
    "DensePoseBaseSampler",
    "DensePoseUniformSampler",
    "DensePoseConfidenceBasedSampler",
    "MaskFromDensePoseSampler",
    "PredictionToGroundTruthSampler",
    "ScoreBasedFilter",
    "InferenceBasedLoader",
]


# fine chart label (1..24) -> coarse body-part label (1..14)
# (reference samplers/densepose_base.py:172-196)
FINE_TO_COARSE_SEGMENTATION = {
    1: 1, 2: 1,            # torso
    3: 2,                  # right hand
    4: 3,                  # left hand
    5: 4,                  # left foot
    6: 5,                  # right foot
    7: 6, 9: 6,            # upper leg right
    8: 7, 10: 7,           # upper leg left
    11: 8, 13: 8,          # lower leg right
    12: 9, 14: 9,          # lower leg left
    15: 10, 17: 10,        # upper arm left
    16: 11, 18: 11,        # upper arm right
    19: 12, 21: 12,        # lower arm left
    20: 13, 22: 13,        # lower arm right
    23: 14, 24: 14,        # head
}


def _boxes_xyxy(instances: Instances) -> np.ndarray:
    b = instances.pred_boxes
    return np.asarray(b.tensor if hasattr(b, "tensor") else b, np.float64).reshape(-1, 4)


class DensePoseBaseSampler:
    """Draw at most ``count_per_class`` (x, y, u, v, part) points per fine
    chart label from one detection's dense predictions, plus a 256x256 coarse
    segmentation mask (reference samplers/densepose_base.py:16-205).

    Subclasses choose WHICH pixels survive via ``_produce_index_sample``.
    """

    def __init__(self, count_per_class: int = 8, seed: Optional[int] = None):
        self.count_per_class = count_per_class
        self._rng = np.random.RandomState(seed)

    def __call__(self, instances: Instances) -> DensePoseList:
        """DensePose predictions -> DensePose annotations (DensePoseList)."""
        boxes_xyxy = _boxes_xyxy(instances)
        boxes_xywh = BoxMode.convert(boxes_xyxy.copy(), BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        dp_datas = []
        for i in range(boxes_xywh.shape[0]):
            dp_map = instances.pred_densepose[i]
            annotation = self._sample(dp_map, boxes_xyxy[i], make_int_box(boxes_xywh[i]))
            annotation[DensePoseDataRelative.S_KEY] = self._resample_mask(dp_map)
            dp_datas.append(DensePoseDataRelative(annotation))
        return DensePoseList(dp_datas, boxes_xyxy, instances.image_size)

    def _sample(self, dp_map: Dict[str, np.ndarray], box_xyxy, box_xywh) -> Dict[str, List[Any]]:
        labels, dp_result = self._produce_labels_and_results(dp_map, box_xyxy)
        annotation: Dict[str, List[Any]] = {
            DensePoseDataRelative.X_KEY: [],
            DensePoseDataRelative.Y_KEY: [],
            DensePoseDataRelative.U_KEY: [],
            DensePoseDataRelative.V_KEY: [],
            DensePoseDataRelative.I_KEY: [],
        }
        n, h, w = dp_result.shape
        for part_id in range(1, DensePoseDataRelative.N_PART_LABELS + 1):
            yy, xx = np.nonzero(labels == part_id)
            k = yy.shape[0]
            count = min(self.count_per_class, k)
            if count <= 0:
                continue
            values = dp_result[:, yy, xx]  # [n, k]
            index_sample = np.asarray(self._produce_index_sample(values, count))
            sampled = values[:, index_sample]
            # box-relative 256-normalized coordinates, pixel centers
            x = (xx[index_sample] + 0.5) / w * 256.0
            y = (yy[index_sample] + 0.5) / h * 256.0
            annotation[DensePoseDataRelative.X_KEY].extend(x.tolist())
            annotation[DensePoseDataRelative.Y_KEY].extend(y.tolist())
            annotation[DensePoseDataRelative.U_KEY].extend(np.clip(sampled[0], 0, 1).tolist())
            annotation[DensePoseDataRelative.V_KEY].extend(np.clip(sampled[1], 0, 1).tolist())
            annotation[DensePoseDataRelative.I_KEY].extend([part_id] * count)
        return annotation

    def _produce_index_sample(self, values: np.ndarray, count: int) -> np.ndarray:
        """Pick ``count`` column indices of ``values`` [n, k]. Abstract."""
        raise NotImplementedError

    def _produce_labels_and_results(
        self, dp_map: Dict[str, np.ndarray], box_xyxy
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One detection's maps -> (labels [h, w], results [2, h, w] = U, V)."""
        result = ToChartResultConverter.convert(dp_map, box_xyxy)
        return result.labels, result.uv

    def _resample_mask(self, dp_map: Dict[str, np.ndarray]) -> np.ndarray:
        """Predictor maps -> [256, 256] coarse segmentation annotation via the
        fine -> coarse label mapping (reference densepose_base.py:130-205)."""
        sz = DensePoseDataRelative.MASK_SIZE
        coarse = _resize_chw(dp_map["coarse_segm"], sz, sz).argmax(axis=-1)
        fine = _resize_chw(dp_map["fine_segm"], sz, sz).argmax(axis=-1) * (coarse > 0)
        mask = np.zeros((sz, sz), np.int64)
        for fine_id, coarse_id in FINE_TO_COARSE_SEGMENTATION.items():
            mask[fine == fine_id] = coarse_id
        return mask


class DensePoseUniformSampler(DensePoseBaseSampler):
    """Uniform sampling over all pixels of each chart label
    (reference samplers/densepose_uniform.py:11-43)."""

    def _produce_index_sample(self, values: np.ndarray, count: int) -> np.ndarray:
        return self._rng.choice(values.shape[1], size=count, replace=False)


class DensePoseConfidenceBasedSampler(DensePoseBaseSampler):
    """Sampling weighted toward the most confident predictions
    (reference samplers/densepose_confidence_based.py:14-110): sort pixels by
    the chosen confidence channel, keep a search window of the best, sample
    uniformly inside it.
    """

    def __init__(
        self,
        confidence_channel: str,
        count_per_class: int = 8,
        search_count_multiplier: Optional[float] = None,
        search_proportion: Optional[float] = None,
        seed: Optional[int] = None,
    ):
        super().__init__(count_per_class, seed=seed)
        self.confidence_channel = confidence_channel
        self.search_count_multiplier = search_count_multiplier
        self.search_proportion = search_proportion
        assert (search_count_multiplier is None) or (search_proportion is None), (
            f"Cannot specify both search_count_multiplier (={search_count_multiplier}) "
            f"and search_proportion (={search_proportion})"
        )

    def _produce_index_sample(self, values: np.ndarray, count: int) -> np.ndarray:
        k = values.shape[1]
        if k == count:
            return np.arange(k)
        # best = smallest variance (reference orders ascending and takes the head)
        sorted_confidence_indices = np.argsort(values[2], kind="stable")
        if self.search_count_multiplier is not None:
            search_count = min(int(count * self.search_count_multiplier), k)
        elif self.search_proportion is not None:
            search_count = min(max(int(k * self.search_proportion), count), k)
        else:
            search_count = min(count, k)
        sample_from_top = self._rng.choice(search_count, size=count, replace=False)
        return sorted_confidence_indices[:search_count][sample_from_top]

    def _produce_labels_and_results(
        self, dp_map: Dict[str, np.ndarray], box_xyxy
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(labels [h, w], results [3, h, w] = U, V, confidence)."""
        result = ToChartResultConverterWithConfidences.convert(dp_map, box_xyxy)
        conf = getattr(result, self.confidence_channel)
        assert conf is not None, f"prediction has no {self.confidence_channel} channel"
        return result.labels, np.concatenate([result.uv, conf[None]], axis=0)


class MaskFromDensePoseSampler:
    """DensePose predictions -> full-image BitMasks GT
    (reference samplers/mask_from_densepose.py:10-30)."""

    def __call__(self, instances: Instances):
        coarse = np.stack([dp["coarse_segm"] for dp in instances.pred_densepose], axis=0)
        return ToMaskConverter.convert(coarse, _boxes_xyxy(instances), instances.image_size)


@dataclass
class _Sampler:
    """(reference samplers/prediction_to_gt.py:15-27)."""

    src: str
    dst: Optional[str]
    func: Optional[Callable[[Any], Any]]


class PredictionToGroundTruthSampler:
    """Convert model predictions into ground-truth fields through registered
    per-field samplers (reference samplers/prediction_to_gt.py:29-100)."""

    def __init__(self, dataset_name: str = ""):
        self.dataset_name = dataset_name
        self._samplers: Dict[Tuple[str, Optional[str]], _Sampler] = {}
        self.register_sampler("pred_boxes", "gt_boxes", None)
        self.register_sampler("pred_classes", "gt_classes", None)
        self.register_sampler("scores")  # delete scores

    def __call__(self, model_output: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        for model_output_i in model_output:
            instances: Instances = model_output_i["instances"]
            for sampler in self._samplers.values():
                if not instances.has(sampler.src) or sampler.dst is None:
                    continue
                if sampler.func is None:
                    instances.set(sampler.dst, instances.get(sampler.src))
                else:
                    instances.set(sampler.dst, sampler.func(instances))
            for sampler in self._samplers.values():
                if sampler.src != sampler.dst and instances.has(sampler.src):
                    instances.remove(sampler.src)
            model_output_i["dataset"] = self.dataset_name
        return model_output

    def register_sampler(
        self,
        prediction_attr: str,
        gt_attr: Optional[str] = None,
        func: Optional[Callable[[Any], Any]] = None,
    ) -> None:
        self._samplers[(prediction_attr, gt_attr)] = _Sampler(prediction_attr, gt_attr, func)

    def remove_sampler(self, prediction_attr: str, gt_attr: Optional[str] = None) -> None:
        assert (prediction_attr, gt_attr) in self._samplers
        del self._samplers[(prediction_attr, gt_attr)]


class ScoreBasedFilter:
    """Drop detections scored below ``min_score``
    (reference inference_based_loader.py:35-51)."""

    def __init__(self, min_score: float = 0.8):
        self.min_score = min_score

    def __call__(self, model_output: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        for model_output_i in model_output:
            instances = model_output_i["instances"]
            if not instances.has("scores"):
                continue
            keep = np.asarray(instances.scores) >= self.min_score
            model_output_i["instances"] = instances[keep]
        return model_output


def _grouper(iterable: Iterable[Any], n: int, fillvalue=None) -> Iterator[Tuple[Any, ...]]:
    """(reference inference_based_loader.py:14-31)."""
    it = iter(iterable)
    while True:
        values = []
        for _ in range(n):
            try:
                values.append(next(it))
            except StopIteration:
                if values:
                    values.extend([fillvalue] * (n - len(values)))
                    yield tuple(values)
                return
        yield tuple(values)


class InferenceBasedLoader:
    """Training-data loader whose annotations come from a model
    (reference inference_based_loader.py:54-174).

    TPU re-design: the reference holds a torch ``nn.Module`` and moves
    tensors to its device; here ``predict_fn`` is any callable mapping a
    list of per-image dicts (with "image" [H, W, C] and "category") to a
    list of {"instances": Instances} — in practice a jitted ``model.apply``
    plus host postprocessing (e.g. DefaultPredictor-style). Batching,
    shuffling, filtering, and sampling semantics match the reference.
    """

    def __init__(
        self,
        predict_fn: Callable[[List[Dict[str, Any]]], List[Dict[str, Any]]],
        data_loader: Iterable[List[Dict[str, Any]]],
        data_sampler: Optional[Callable] = None,
        data_filter: Optional[Callable] = None,
        shuffle: bool = True,
        batch_size: int = 4,
        inference_batch_size: int = 4,
        drop_last: bool = False,
        category_to_class_mapping: Optional[dict] = None,
        seed: Optional[int] = None,
    ):
        self.predict_fn = predict_fn
        self.data_loader = data_loader
        self.data_sampler = data_sampler
        self.data_filter = data_filter
        self.shuffle = shuffle
        self.batch_size = batch_size
        self.inference_batch_size = inference_batch_size
        self.drop_last = drop_last
        self.category_to_class_mapping = category_to_class_mapping or {}
        self._rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[List[Dict[str, Any]]]:
        for batch in self.data_loader:
            # batch: List[{"images": [N images], "categories": [N strs]}]
            images_and_categories = [
                {"image": image, "category": category}
                for element in batch
                for image, category in zip(element["images"], element["categories"])
            ]
            if not images_and_categories:
                continue
            if self.shuffle:
                self._rng.shuffle(images_and_categories)
            yield from self._produce_data(images_and_categories)

    def _produce_data(
        self, images_and_categories: List[Dict[str, Any]]
    ) -> Iterator[List[Dict[str, Any]]]:
        data_batches: List[Dict[str, Any]] = []
        for group in _grouper(images_and_categories, self.inference_batch_size):
            batch = [ic for ic in group if ic is not None]
            if not batch:
                continue
            model_output = self.predict_fn(batch)
            for model_output_i, batch_i in zip(model_output, batch):
                model_output_i["image"] = batch_i["image"]
                instance_class = self.category_to_class_mapping.get(batch_i["category"], 0)
                n_inst = len(model_output_i["instances"]) if model_output_i["instances"].has("pred_boxes") else 0
                model_output_i["instances"].set(
                    "dataset_classes", np.full((n_inst,), instance_class, np.int64)
                )
            model_output_filtered = (
                model_output if self.data_filter is None else self.data_filter(model_output)
            )
            data = (
                model_output_filtered
                if self.data_sampler is None
                else self.data_sampler(model_output_filtered)
            )
            for data_i in data:
                if len(data_i["instances"]):
                    data_batches.append(data_i)
            if len(data_batches) >= self.batch_size:
                yield data_batches[: self.batch_size]
                data_batches = data_batches[self.batch_size :]
        if not self.drop_last and data_batches:
            yield data_batches
