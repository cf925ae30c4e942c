from detectron2_tpu.checkpoint.d2_converter import convert_d2_state_dict
from detectron2_tpu.checkpoint.detection_checkpoint import (
    Checkpointer,
    DetectionCheckpointer,
    PeriodicCheckpointer,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
