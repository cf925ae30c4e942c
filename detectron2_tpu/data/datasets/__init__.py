from detectron2_tpu.data.datasets import builtin as _builtin  # registers builtin datasets
from detectron2_tpu.data.datasets.builtin_meta import _get_builtin_metadata
from detectron2_tpu.data.datasets.cityscapes import (
    load_cityscapes_instances,
    load_cityscapes_semantic,
    register_cityscapes,
)
from detectron2_tpu.data.datasets.cityscapes_panoptic import (
    load_cityscapes_panoptic,
    register_all_cityscapes_panoptic,
)
from detectron2_tpu.data.datasets.coco_panoptic import (
    register_coco_panoptic,
    register_coco_panoptic_separated,
)
from detectron2_tpu.data.datasets.lvis import load_lvis_json, register_lvis_instances
from detectron2_tpu.data.datasets.pascal_voc import load_voc_instances, register_pascal_voc
from detectron2_tpu.data.datasets.coco import (
    convert_to_coco_json,
    load_coco_json,
    load_sem_seg,
    register_coco_instances,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
