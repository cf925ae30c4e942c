"""Anchor generation (reference detectron2/modeling/anchor_generator.py).

Anchors are compile-time constants of each (feature-size, stride) signature:
cell anchors are numpy computed at build time, grids are produced inside the
traced function as jnp constants — XLA folds them. Ordering matches the
reference ((H, W, A) flattened with A fastest, anchor_generator.py:165-180)
so converted weights predict the same boxes.
"""

import math
from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from detectron2_tpu.config import configurable
from detectron2_tpu.layers.shape_spec import ShapeSpec
from detectron2_tpu.utils.registry import Registry

ANCHOR_GENERATOR_REGISTRY = Registry("ANCHOR_GENERATOR")
"""Registry for anchor generators (produce anchors from feature maps)."""

__all__ = ["ANCHOR_GENERATOR_REGISTRY", "DefaultAnchorGenerator", "RotatedAnchorGenerator", "build_anchor_generator"]


def _broadcast_params(params, num_features: int, name: str):
    """SIZES / ASPECT_RATIOS may be one list (shared over levels) or one per
    level (reference anchor_generator.py:50-84)."""
    assert isinstance(params, Sequence), f"{name} in anchor generator has to be a list! Got {params}."
    assert len(params), f"{name} in anchor generator cannot be empty!"
    if not isinstance(params[0], Sequence):  # params is list[float]
        return [list(params)] * num_features
    if len(params) == 1:
        return list(params) * num_features
    assert len(params) == num_features, (
        f"Got {name} of length {len(params)} in anchor generator, but the number of input features is {num_features}!"
    )
    return [list(p) for p in params]


@ANCHOR_GENERATOR_REGISTRY.register()
class DefaultAnchorGenerator:
    """Computes anchors in the standard way described in "Faster R-CNN"
    (reference anchor_generator.py:86-233)."""

    box_dim: int = 4

    @configurable
    def __init__(self, *, sizes, aspect_ratios, strides, offset: float = 0.5):
        """
        Args:
            sizes: list[list[float]] or list[float] — anchor sizes (sqrt of
                area) per feature map.
            aspect_ratios: same structure — H/W ratios.
            strides: list[int] — feature map strides.
            offset: relative offset of anchor centers from cell corners, in
                [0, 1).
        """
        self.strides = list(strides)
        self.num_features = len(self.strides)
        sizes = _broadcast_params(sizes, self.num_features, "sizes")
        aspect_ratios = _broadcast_params(aspect_ratios, self.num_features, "aspect_ratios")
        self.cell_anchors = [
            self._generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]
        self.offset = offset
        assert 0.0 <= self.offset < 1.0, self.offset

    @classmethod
    def from_config(cls, cfg, input_shape: List[ShapeSpec]):
        return {
            "sizes": cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            "aspect_ratios": cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            "strides": [x.stride for x in input_shape],
            "offset": cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        }

    @property
    def num_cell_anchors(self):
        return self.num_anchors

    @property
    def num_anchors(self) -> List[int]:
        """Number of anchors per spatial position per feature map."""
        return [len(c) for c in self.cell_anchors]

    def _generate_cell_anchors(self, sizes, aspect_ratios) -> np.ndarray:
        """Anchors centered on (0, 0) for one feature level: XYXY [A, 4],
        ordered sizes-major / ratios-minor like the reference (:181-233)."""
        anchors = []
        for size in sizes:
            area = size**2.0
            for aspect_ratio in aspect_ratios:
                w = math.sqrt(area / aspect_ratio)
                h = aspect_ratio * w
                anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
        return np.asarray(anchors, dtype=np.float32)

    def grid_anchors(self, grid_sizes: List[Tuple[int, int]]) -> List[jnp.ndarray]:
        """
        Args:
            grid_sizes: (H, W) of each feature map (static).

        Returns:
            list of [H*W*A, 4] anchors per level (A fastest-varying).
        """
        anchors = []
        for (H, W), stride, base in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(W, dtype=np.float32) + self.offset) * stride
            shift_y = (np.arange(H, dtype=np.float32) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W]
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [H*W, 1, 4]
            a = (shifts + base[None, :, :]).reshape(-1, 4)
            anchors.append(jnp.asarray(a))
        return anchors

    def __call__(self, grid_sizes: List[Tuple[int, int]]) -> List[jnp.ndarray]:
        """Takes static grid sizes (TPU design: anchors depend only on the
        padded feature shapes, which are static under jit; the reference takes
        the features themselves, anchor_generator.py:207)."""
        return self.grid_anchors(grid_sizes)


@ANCHOR_GENERATOR_REGISTRY.register()
class RotatedAnchorGenerator(DefaultAnchorGenerator):
    """Anchors with rotation angles for RRPN (reference anchor_generator.py:235-330)."""

    box_dim: int = 5

    @configurable
    def __init__(self, *, sizes, aspect_ratios, strides, angles, offset: float = 0.5):
        self.strides = list(strides)
        self.num_features = len(self.strides)
        sizes = _broadcast_params(sizes, self.num_features, "sizes")
        aspect_ratios = _broadcast_params(aspect_ratios, self.num_features, "aspect_ratios")
        angles = _broadcast_params(angles, self.num_features, "angles")
        self.cell_anchors = [
            self._generate_cell_anchors_rotated(s, a, ang)
            for s, a, ang in zip(sizes, aspect_ratios, angles)
        ]
        self.offset = offset
        assert 0.0 <= self.offset < 1.0, self.offset

    @classmethod
    def from_config(cls, cfg, input_shape: List[ShapeSpec]):
        return {
            "sizes": cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            "aspect_ratios": cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            "strides": [x.stride for x in input_shape],
            "offset": cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
            "angles": cfg.MODEL.ANCHOR_GENERATOR.ANGLES,
        }

    def _generate_cell_anchors_rotated(self, sizes, aspect_ratios, angles) -> np.ndarray:
        """(cx=0, cy=0, w, h, angle) anchors [A, 5]."""
        anchors = []
        for size in sizes:
            area = size**2.0
            for aspect_ratio in aspect_ratios:
                w = math.sqrt(area / aspect_ratio)
                h = aspect_ratio * w
                anchors.extend([0, 0, w, h, a] for a in angles)
        return np.asarray(anchors, dtype=np.float32)

    def grid_anchors(self, grid_sizes: List[Tuple[int, int]]) -> List[jnp.ndarray]:
        anchors = []
        for (H, W), stride, base in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(W, dtype=np.float32) + self.offset) * stride
            shift_y = (np.arange(H, dtype=np.float32) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            zeros = np.zeros_like(sx)
            shifts = np.stack([sx, sy, zeros, zeros, zeros], axis=-1).reshape(-1, 1, 5)
            a = (shifts + base[None, :, :]).reshape(-1, 5)
            anchors.append(jnp.asarray(a))
        return anchors


def build_anchor_generator(cfg, input_shape):
    """Built anchor generator from `cfg.MODEL.ANCHOR_GENERATOR.NAME`."""
    anchor_generator = cfg.MODEL.ANCHOR_GENERATOR.NAME
    return ANCHOR_GENERATOR_REGISTRY.get(anchor_generator)(cfg, input_shape)
