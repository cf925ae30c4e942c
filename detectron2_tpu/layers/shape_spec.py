"""ShapeSpec: the backbone <-> heads contract (reference detectron2/layers/shape_spec.py:7)."""

from dataclasses import dataclass
from typing import Optional


@dataclass
class ShapeSpec:
    """A simple structure that contains basic shape specification about a
    tensor, used as the auxiliary inputs/outputs of models to complement the
    lack of shape inference ability among modules."""

    channels: Optional[int] = None
    height: Optional[int] = None
    width: Optional[int] = None
    stride: Optional[int] = None
