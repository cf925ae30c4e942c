from detectron2_tpu.data.datasets import builtin as _builtin  # registers builtin datasets
from detectron2_tpu.data.datasets.builtin_meta import _get_builtin_metadata
from detectron2_tpu.data.datasets.coco import (
    convert_to_coco_json,
    load_coco_json,
    load_sem_seg,
    register_coco_instances,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
