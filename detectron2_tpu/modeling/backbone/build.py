"""Backbone registry + builder (reference detectron2/modeling/backbone/build.py:20-33)."""

from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.utils.registry import Registry

BACKBONE_REGISTRY = Registry("BACKBONE")
"""Registry for backbones: callables taking (cfg, input_shape) -> Backbone."""

__all__ = ["BACKBONE_REGISTRY", "build_backbone"]


def build_backbone(cfg, input_shape: ShapeSpec = None):
    """Build a backbone from `cfg.MODEL.BACKBONE.NAME`."""
    if input_shape is None:
        input_shape = ShapeSpec(channels=len(cfg.MODEL.PIXEL_MEAN))

    backbone_name = cfg.MODEL.BACKBONE.NAME
    backbone = BACKBONE_REGISTRY.get(backbone_name)(cfg, input_shape)
    from detectron2_tpu.modeling.backbone.backbone import Backbone

    assert isinstance(backbone, Backbone)
    return backbone
