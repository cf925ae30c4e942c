"""Backbone ABC (reference detectron2/modeling/backbone/backbone.py:11-74).

Contract: ``__call__ -> dict[str, Tensor]`` (NHWC feature maps),
``output_shape() -> dict[str, ShapeSpec]`` available before parameters exist
(flax modules are static dataclasses, so shapes derive from config alone),
plus ``size_divisibility`` / ``padding_constraints`` consumed by
ImageList.from_tensors.
"""

from typing import Dict

from flax import linen as nn

from detectron2_tpu.layers.shape_spec import ShapeSpec

__all__ = ["Backbone"]


class Backbone(nn.Module):
    """Abstract base class for network backbones."""

    def output_shape(self) -> Dict[str, ShapeSpec]:
        """ShapeSpec (channels, stride) of each returned feature map."""
        raise NotImplementedError

    @property
    def size_divisibility(self) -> int:
        """Input H, W must be divisible by this (e.g. the coarsest FPN
        stride); used when padding batches."""
        return 0

    @property
    def padding_constraints(self) -> Dict[str, int]:
        """Extra padding requirements, e.g. {"square_size": N} for backbones
        requiring fixed square inputs (ViT)."""
        return {}
