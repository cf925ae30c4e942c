"""RotatedBoxes: Nx5 (cx, cy, w, h, angle_degrees) boxes.

Parity with reference detectron2/structures/rotated_boxes.py:11-505. The
angle is in degrees, ccw; see the reference docstring for the coordinate
convention. pairwise_iou delegates to the vectorized jax polygon-clip kernel
in ops/rotated_boxes_ops.py (replacing the reference's CUDA op).
"""

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["RotatedBoxes", "pairwise_iou_rotated", "pairwise_iou"]


@jax.tree_util.register_pytree_node_class
class RotatedBoxes:
    """A list of rotated boxes as an Nx5 (x_center, y_center, width, height,
    angle) array. Angle is in degrees ccw."""

    def __init__(self, tensor):
        if not hasattr(tensor, "shape"):
            tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if tensor.ndim == 1 and tensor.size == 0:
            tensor = jnp.zeros((0, 5), dtype=jnp.float32)
        assert tensor.ndim == 2 and tensor.shape[-1] == 5, tensor.shape
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tensor = children[0]
        return obj

    def clone(self) -> "RotatedBoxes":
        return RotatedBoxes(jnp.array(self.tensor))

    def to(self, *args, **kwargs) -> "RotatedBoxes":
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    def area(self):
        return self.tensor[:, 2] * self.tensor[:, 3]

    def normalize_angles(self) -> None:
        """Restrict angles to (-180, 180] degrees (reference rotated_boxes.py:220)."""
        a = self.tensor[:, 4]
        a = (a + 180.0) % 360.0 - 180.0
        # map -180 to 180
        a = jnp.where(a == -180.0, 180.0, a)
        self.tensor = jnp.concatenate([self.tensor[:, :4], a[:, None]], axis=1)

    def clip(self, box_size: Tuple[int, int], clip_angle_threshold: float = 1.0) -> None:
        """For nearly axis-aligned boxes (|angle| <= threshold), clip them to
        the image like horizontal boxes; others are left untouched
        (reference rotated_boxes.py:241-295)."""
        h, w = box_size
        self.normalize_angles()

        t = self.tensor
        cx, cy, bw, bh, a = t[:, 0], t[:, 1], t[:, 2], t[:, 3], t[:, 4]
        near_axis = jnp.abs(a) <= clip_angle_threshold

        x1 = cx - bw / 2.0
        y1 = cy - bh / 2.0
        x2 = cx + bw / 2.0
        y2 = cy + bh / 2.0

        x1c = jnp.clip(x1, 0, w)
        y1c = jnp.clip(y1, 0, h)
        x2c = jnp.clip(x2, 0, w)
        y2c = jnp.clip(y2, 0, h)

        ncx = jnp.where(near_axis, (x1c + x2c) / 2.0, cx)
        ncy = jnp.where(near_axis, (y1c + y2c) / 2.0, cy)
        nw = jnp.where(near_axis, x2c - x1c, bw)
        nh = jnp.where(near_axis, y2c - y1c, bh)
        self.tensor = jnp.stack([ncx, ncy, nw, nh, a], axis=-1)

    def nonempty(self, threshold: float = 0.0):
        widths = self.tensor[:, 2]
        heights = self.tensor[:, 3]
        return (widths > threshold) & (heights > threshold)

    def __getitem__(self, item) -> "RotatedBoxes":
        if isinstance(item, int):
            return RotatedBoxes(self.tensor[item][None, :])
        b = self.tensor[item]
        assert b.ndim == 2, f"Indexing on RotatedBoxes with {item} failed!"
        return RotatedBoxes(b)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return "RotatedBoxes(" + str(self.tensor) + ")"

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0):
        """Boxes whose *centers* are inside the image (reference
        rotated_boxes.py:440: rotated boxes use center containment)."""
        height, width = box_size
        cx = self.tensor[:, 0]
        cy = self.tensor[:, 1]
        return (
            (cx >= -boundary_threshold)
            & (cy >= -boundary_threshold)
            & (cx < width + boundary_threshold)
            & (cy < height + boundary_threshold)
        )

    def get_centers(self):
        return self.tensor[:, :2]

    def scale(self, scale_x: float, scale_y: float) -> None:
        """Scale the rotated box; angles change too unless the scaling is
        isotropic (exact math as reference rotated_boxes.py:356-438)."""
        t = self.tensor
        cx = t[:, 0] * scale_x
        cy = t[:, 1] * scale_y
        theta = t[:, 4] * (jnp.pi / 180.0)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        # width vector (c, s) scales to (sx*c, sy*s)
        w = t[:, 2] * jnp.sqrt((scale_x * c) ** 2 + (scale_y * s) ** 2)
        # height vector (-s, c) scales to (-sx*s, sy*c)
        h = t[:, 3] * jnp.sqrt((scale_x * s) ** 2 + (scale_y * c) ** 2)
        a = jnp.arctan2(scale_x * s, scale_y * c) * (180.0 / jnp.pi)
        self.tensor = jnp.stack([cx, cy, w, h, a], axis=-1)

    @classmethod
    def cat(cls, boxes_list: List["RotatedBoxes"]) -> "RotatedBoxes":
        assert isinstance(boxes_list, (list, tuple))
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 5), dtype=jnp.float32))
        assert all(isinstance(box, RotatedBoxes) for box in boxes_list)
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    def __iter__(self):
        yield from self.tensor


def pairwise_iou(boxes1: "RotatedBoxes", boxes2: "RotatedBoxes"):
    """Pairwise IoU of rotated boxes -> [N, M] (reference rotated_boxes.py:490)."""
    from detectron2_tpu.ops.rotated_boxes_ops import pairwise_iou_rotated as _iou

    b1 = boxes1.tensor if isinstance(boxes1, RotatedBoxes) else boxes1
    b2 = boxes2.tensor if isinstance(boxes2, RotatedBoxes) else boxes2
    return _iou(b1, b2)


pairwise_iou_rotated = pairwise_iou
