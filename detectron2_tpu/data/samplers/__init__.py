from detectron2_tpu.data.samplers.distributed_sampler import (
    InferenceSampler,
    RandomSubsetTrainingSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
)
from detectron2_tpu.data.samplers.grouped_batch_sampler import GroupedBatchSampler

__all__ = [k for k in globals().keys() if not k.startswith("_")]
