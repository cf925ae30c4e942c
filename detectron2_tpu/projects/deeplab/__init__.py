"""DeepLabV3 / DeepLabV3+ semantic segmentation
(reference projects/DeepLab/deeplab/).

Importing this package registers ``DeepLabV3Head`` / ``DeepLabV3PlusHead``
into ``SEM_SEG_HEADS_REGISTRY`` and the DeepLab ResNet variant into
``BACKBONE_REGISTRY``.
"""

from detectron2_tpu.projects.deeplab.build_solver import WarmupPolyLR, build_lr_scheduler
from detectron2_tpu.projects.deeplab.config import add_deeplab_config
from detectron2_tpu.projects.deeplab.loss import hard_pixel_mining_ce
from detectron2_tpu.projects.deeplab.resnet import DeepLabStem, build_resnet_deeplab_backbone
from detectron2_tpu.projects.deeplab.semantic_seg import DeepLabV3Head, DeepLabV3PlusHead

__all__ = [
    "add_deeplab_config",
    "build_lr_scheduler",
    "WarmupPolyLR",
    "hard_pixel_mining_ce",
    "DeepLabStem",
    "build_resnet_deeplab_backbone",
    "DeepLabV3Head",
    "DeepLabV3PlusHead",
]
