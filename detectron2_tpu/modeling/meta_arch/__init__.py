from detectron2_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY, build_model
from detectron2_tpu.modeling.meta_arch.rcnn import GeneralizedRCNN, ProposalNetwork

__all__ = [k for k in globals().keys() if not k.startswith("_")]
