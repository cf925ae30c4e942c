"""Boxes, BoxMode, and pairwise box geometry — jit-friendly.

TPU-native design notes (vs reference detectron2/structures/boxes.py):

- :class:`Boxes` wraps an ``[N, 4]`` XYXY_ABS array and is registered as a jax
  pytree, so it flows through ``jit`` / ``vmap`` / shardings transparently. The
  wrapped array may be a jax array, a numpy array, or a tracer.
- All geometry (iou, clip, ...) is written as pure functions of arrays with
  static shapes; methods that in the reference return data-dependent shapes
  (``nonempty``) return boolean masks here, to be consumed by ``jnp.where`` —
  padded/masked is the fixed-shape TPU formulation of detectron2's dynamic
  filtering (SURVEY.md §7.1).
"""

import math
from enum import IntEnum, unique
from typing import List, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

Array = Union[np.ndarray, jnp.ndarray]

__all__ = [
    "BoxMode",
    "Boxes",
    "pairwise_intersection",
    "pairwise_iou",
    "pairwise_ioa",
    "pairwise_point_box_distance",
    "matched_pairwise_iou",
]


@unique
class BoxMode(IntEnum):
    """Enum of different ways to represent a box (values match the reference
    structures/boxes.py:18-41 so serialized datasets interoperate)."""

    XYXY_ABS = 0
    """(x0, y0, x1, y1) in absolute floating points coordinates."""
    XYWH_ABS = 1
    """(x0, y0, w, h) in absolute floating points coordinates."""
    XYXY_REL = 2
    """Not yet supported! (x0, y0, x1, y1) in range [0, 1] relative to image size."""
    XYWH_REL = 3
    """Not yet supported! (x0, y0, w, h) in range [0, 1] relative to image size."""
    XYWHA_ABS = 4
    """(xc, yc, w, h, a) in absolute floating points coordinates; angle a in ccw degrees."""

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        """Convert a k-tuple/list or an Nxk array between box modes (k=4 or 5).
        Returns the same container type as the input.

        Semantics identical to reference boxes.py:44-128.
        """
        if from_mode == to_mode:
            return box

        original_type = type(box)
        single_box = isinstance(box, (list, tuple))
        if single_box:
            assert len(box) == 4 or len(box) == 5, (
                "BoxMode.convert takes either a k-tuple/list or an Nxk array/tensor,"
                " where k == 4 or 5"
            )
            arr = np.asarray(box, dtype=np.float64)[None, :]
            xp = np
        else:
            xp = jnp if isinstance(box, jnp.ndarray) and not isinstance(box, np.ndarray) else np
            arr = xp.asarray(box)

        assert to_mode not in [BoxMode.XYXY_REL, BoxMode.XYWH_REL] and from_mode not in [
            BoxMode.XYXY_REL,
            BoxMode.XYWH_REL,
        ], "Relative mode not yet supported!"

        original_dtype = arr.dtype

        if from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            assert arr.shape[-1] == 5, "The last dimension of input shape must be 5 for XYWHA format"
            arr = arr.astype(xp.float64) if xp is np else arr.astype(jnp.float32)
            cx, cy, w, h, a = (arr[:, i] for i in range(5))
            c = xp.abs(xp.cos(a * math.pi / 180.0))
            s = xp.abs(xp.sin(a * math.pi / 180.0))
            # the horizontal bounding rectangle of the rotated box
            new_w = c * w + s * h
            new_h = c * h + s * w
            x0 = cx - new_w / 2.0
            y0 = cy - new_h / 2.0
            arr = xp.stack([x0, y0, x0 + new_w, y0 + new_h], axis=-1).astype(original_dtype)
        elif from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYWHA_ABS:
            arr = arr.astype(xp.float64) if xp is np else arr.astype(jnp.float32)
            cx = arr[:, 0] + arr[:, 2] / 2.0
            cy = arr[:, 1] + arr[:, 3] / 2.0
            zeros = xp.zeros_like(cx)
            arr = xp.stack([cx, cy, arr[:, 2], arr[:, 3], zeros], axis=-1).astype(original_dtype)
        elif to_mode == BoxMode.XYXY_ABS and from_mode == BoxMode.XYWH_ABS:
            arr = xp.stack(
                [arr[:, 0], arr[:, 1], arr[:, 0] + arr[:, 2], arr[:, 1] + arr[:, 3]], axis=-1
            )
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            arr = xp.stack(
                [arr[:, 0], arr[:, 1], arr[:, 2] - arr[:, 0], arr[:, 3] - arr[:, 1]], axis=-1
            )
        else:
            raise NotImplementedError(
                f"Conversion from BoxMode {from_mode} to {to_mode} is not supported yet"
            )

        if single_box:
            return original_type(np.asarray(arr).flatten().tolist())
        return arr


@jax.tree_util.register_pytree_node_class
class Boxes:
    """A list of boxes as an Nx4 XYXY_ABS array (reference boxes.py:130-309).

    Registered as a jax pytree: the wrapped array is the single leaf, so Boxes
    objects pass through jit/grad/vmap and shardings.
    """

    def __init__(self, tensor: Array):
        if not isinstance(tensor, (np.ndarray, jnp.ndarray)) and not hasattr(tensor, "shape"):
            tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if hasattr(tensor, "ndim") and tensor.ndim == 1 and tensor.size == 0:
            tensor = jnp.zeros((0, 4), dtype=jnp.float32)
        assert tensor.ndim == 2 and tensor.shape[-1] == 4, f"bad box shape: {tensor.shape}"
        self.tensor = tensor

    # pytree protocol
    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tensor = children[0]
        return obj

    def clone(self) -> "Boxes":
        return Boxes(jnp.array(self.tensor) if isinstance(self.tensor, jnp.ndarray) else self.tensor.copy())

    def to(self, *args, **kwargs) -> "Boxes":
        # device movement is handled by jax; kept for API parity
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    def area(self) -> Array:
        """The area of each box."""
        box = self.tensor
        return (box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1])

    def clip(self, box_size: Tuple[int, int]) -> None:
        """Clip (in place) the boxes to the size h x w (reference boxes.py:183)."""
        h, w = box_size
        x1 = jnp.clip(self.tensor[:, 0], 0, w)
        y1 = jnp.clip(self.tensor[:, 1], 0, h)
        x2 = jnp.clip(self.tensor[:, 2], 0, w)
        y2 = jnp.clip(self.tensor[:, 3], 0, h)
        self.tensor = jnp.stack([x1, y1, x2, y2], axis=-1)

    def nonempty(self, threshold: float = 0.0) -> Array:
        """A boolean mask of boxes with width/height > threshold
        (reference boxes.py:199). Fixed shape: callers mask, never gather."""
        box = self.tensor
        widths = box[:, 2] - box[:, 0]
        heights = box[:, 3] - box[:, 1]
        return (widths > threshold) & (heights > threshold)

    def __getitem__(self, item) -> "Boxes":
        """Index with int, slice, or a (numpy/jax) index/mask array. Boolean
        masks require concrete (non-traced) arrays — inside jit, use
        ``nonempty()`` masks with where/select instead."""
        if isinstance(item, int):
            return Boxes(self.tensor[item][None, :])
        b = self.tensor[item]
        assert b.ndim == 2, f"Indexing on Boxes with {item} failed to return a matrix!"
        return Boxes(b)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return "Boxes(" + str(self.tensor) + ")"

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> Array:
        """Boolean mask of boxes inside the image (reference boxes.py:245)."""
        height, width = box_size
        b = self.tensor
        return (
            (b[:, 0] >= -boundary_threshold)
            & (b[:, 1] >= -boundary_threshold)
            & (b[:, 2] < width + boundary_threshold)
            & (b[:, 3] < height + boundary_threshold)
        )

    def get_centers(self) -> Array:
        return (self.tensor[:, :2] + self.tensor[:, 2:]) / 2

    def scale(self, scale_x: float, scale_y: float) -> None:
        """Scale the box with horizontal and vertical scaling factors."""
        sx = jnp.asarray([scale_x, scale_y, scale_x, scale_y], dtype=self.tensor.dtype)
        self.tensor = self.tensor * sx

    @classmethod
    def cat(cls, boxes_list: List["Boxes"]) -> "Boxes":
        """Concatenate a list of Boxes into a single Boxes (reference boxes.py:279)."""
        assert isinstance(boxes_list, (list, tuple))
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 4), dtype=jnp.float32))
        assert all(isinstance(box, Boxes) for box in boxes_list)
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    def __iter__(self):
        yield from self.tensor


def pairwise_intersection(boxes1: Union[Boxes, Array], boxes2: Union[Boxes, Array]) -> Array:
    """Intersection area between all pairs: [N, M] (reference boxes.py:312)."""
    b1 = boxes1.tensor if isinstance(boxes1, Boxes) else boxes1
    b2 = boxes2.tensor if isinstance(boxes2, Boxes) else boxes2
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Union[Boxes, Array], boxes2: Union[Boxes, Array]) -> Array:
    """IoU between all N x M pairs (reference boxes.py:336). Returns [N, M]."""
    b1 = boxes1.tensor if isinstance(boxes1, Boxes) else boxes1
    b2 = boxes2.tensor if isinstance(boxes2, Boxes) else boxes2
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    inter = pairwise_intersection(b1, b2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: Union[Boxes, Array], boxes2: Union[Boxes, Array]) -> Array:
    """intersection-over-boxes2-area between all pairs (reference boxes.py:361)."""
    b2 = boxes2.tensor if isinstance(boxes2, Boxes) else boxes2
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.where(area2[None, :] > 0, area2[None, :], 1.0), 0.0)


def pairwise_point_box_distance(points: Array, boxes: Union[Boxes, Array]) -> Array:
    """Distances from each of N points to each of M box edges: [N, M, 4]
    (left, top, right, bottom), positive iff the point is inside
    (reference boxes.py:381)."""
    b = boxes.tensor if isinstance(boxes, Boxes) else boxes
    x, y = points[:, 0], points[:, 1]
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return jnp.stack(
        [
            x[:, None] - x0[None, :],
            y[:, None] - y0[None, :],
            x1[None, :] - x[:, None],
            y1[None, :] - y[:, None],
        ],
        axis=2,
    )


def matched_pairwise_iou(boxes1: Union[Boxes, Array], boxes2: Union[Boxes, Array]) -> Array:
    """IoU between matched pairs (both length N) -> [N] (reference boxes.py:400)."""
    b1 = boxes1.tensor if isinstance(boxes1, Boxes) else boxes1
    b2 = boxes2.tensor if isinstance(boxes2, Boxes) else boxes2
    assert b1.shape[0] == b2.shape[0], f"boxlists should have the same number of entries, got {b1.shape[0]}, {b2.shape[0]}"
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = jnp.maximum(b1[:, :2], b2[:, :2])
    rb = jnp.minimum(b1[:, 2:], b2[:, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + area2 - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
