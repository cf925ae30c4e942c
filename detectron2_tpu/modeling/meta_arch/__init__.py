from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY, build_model
from detectron2_tpu.modeling.meta_arch.dense_detector import DenseDetector
from detectron2_tpu.modeling.meta_arch.fcos import FCOS, FCOSHead
from detectron2_tpu.modeling.meta_arch.panoptic_fpn import PanopticFPN
from detectron2_tpu.modeling.meta_arch.rcnn import GeneralizedRCNN, ProposalNetwork
from detectron2_tpu.modeling.meta_arch.retinanet import RetinaNet, RetinaNetHead
from detectron2_tpu.modeling.meta_arch.semantic_seg import (
    SEM_SEG_HEADS_REGISTRY,
    SemanticSegmentor,
    SemSegFPNHead,
    build_sem_seg_head,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
