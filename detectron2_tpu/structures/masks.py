"""Instance mask representations: BitMasks, PolygonMasks, ROIMasks.

Parity with reference detectron2/structures/masks.py. Host-side polygon
rasterization uses OpenCV (pycocotools is not a dependency of this framework;
COCO RLE codecs live in detectron2_tpu/evaluation/rle.py). Device-side
crop_and_resize is the framework's RoIAlign on a 1-channel image — the same
formulation the reference uses for mask targets (masks.py:193,396 →
mask_head.py:65).
"""

import copy
import itertools
from typing import Any, Iterator, List, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.structures.boxes import Boxes

__all__ = ["BitMasks", "PolygonMasks", "ROIMasks", "polygons_to_bitmask", "rasterize_polygons_within_box", "polygon_area"]


def polygon_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace formula (reference masks.py:17)."""
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def polygons_to_bitmask(polygons: List[np.ndarray], height: int, width: int) -> np.ndarray:
    """Rasterize polygons to a bool mask of shape (height, width).

    Args:
        polygons (list[ndarray]): each array is of shape (Nx2,) in XY format.

    The reference (masks.py:22) uses pycocotools RLE; this framework uses the
    COCO-compatible rasterizer in evaluation/rle.py so the fill rule matches
    COCO ground truth.
    """
    if len(polygons) == 0:
        # COCOAPI does not support empty polygons
        return np.zeros((height, width)).astype(bool)
    from detectron2_tpu.evaluation.rle import polygons_to_mask

    return polygons_to_mask(polygons, height, width).astype(bool)


def rasterize_polygons_within_box(
    polygons: List[np.ndarray], box: np.ndarray, mask_size: int
) -> np.ndarray:
    """Rasterize the polygons into a mask image and crop the mask content in
    the given box; the cropped mask is resized to (mask_size, mask_size).

    Used to prepare mask training targets; semantics follow reference
    masks.py:39-85 (shift to box origin, scale by mask_size/box size, then
    rasterize at mask_size resolution).

    Returns:
        bool ndarray of shape (mask_size, mask_size)
    """
    # 1. Shift the polygons w.r.t the boxes
    w, h = box[2] - box[0], box[3] - box[1]

    polygons = [np.asarray(p, dtype=np.float64).copy() for p in polygons]
    for p in polygons:
        p[0::2] = p[0::2] - box[0]
        p[1::2] = p[1::2] - box[1]

    # 2. Rescale the polygons to the new box size
    w = max(w, 0.1)
    h = max(h, 0.1)
    ratio_h = mask_size / h
    ratio_w = mask_size / w
    for p in polygons:
        p[0::2] = p[0::2] * ratio_w
        p[1::2] = p[1::2] * ratio_h

    # 3. Rasterize the polygons with coco api
    mask = polygons_to_bitmask(polygons, mask_size, mask_size)
    return mask


class BitMasks:
    """Stores the segmentation masks for all objects in one image, as a
    (N, H, W) bool array (reference masks.py:88-260)."""

    def __init__(self, tensor: Union[np.ndarray, jnp.ndarray]):
        if isinstance(tensor, list):
            tensor = np.stack([np.asarray(t) for t in tensor], axis=0) if len(tensor) else np.zeros((0, 0, 0), dtype=bool)
        assert tensor.ndim == 3, tensor.shape
        self.tensor = tensor
        self.image_size = (int(tensor.shape[1]), int(tensor.shape[2]))

    def to(self, *args: Any, **kwargs: Any) -> "BitMasks":
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    def __getitem__(self, item) -> "BitMasks":
        if isinstance(item, int):
            return BitMasks(self.tensor[item][None])
        m = self.tensor[item]
        assert m.ndim == 3, f"Indexing on BitMasks with {item} returns a tensor with shape {m.shape}!"
        return BitMasks(m)

    def __iter__(self):
        yield from self.tensor

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(num_instances={len(self.tensor)})"

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def nonempty(self) -> np.ndarray:
        """Boolean mask of masks with at least one foreground pixel."""
        xp = jnp if isinstance(self.tensor, jnp.ndarray) else np
        return xp.asarray(self.tensor).reshape(self.tensor.shape[0], -1).any(axis=1)

    @staticmethod
    def from_polygon_masks(polygon_masks, height: int, width: int) -> "BitMasks":
        """
        Args:
            polygon_masks (PolygonMasks or list[list[ndarray]])
        """
        if isinstance(polygon_masks, PolygonMasks):
            polygon_masks = polygon_masks.polygons
        masks = [polygons_to_bitmask(p, height, width) for p in polygon_masks]
        if len(masks):
            return BitMasks(np.stack(masks))
        return BitMasks(np.zeros((0, height, width), dtype=bool))

    @staticmethod
    def from_roi_masks(roi_masks: "ROIMasks", height: int, width: int) -> "BitMasks":
        return roi_masks.to_bitmasks(None, height, width)

    def crop_and_resize(self, boxes, mask_size: int) -> jnp.ndarray:
        """Crop each bitmask by the given box and resize to (mask_size, mask_size):
        the RoIAlign-on-mask formulation the reference uses for mask-loss GT
        (masks.py:193-230).

        Returns:
            A bool array of shape (N, mask_size, mask_size).
        """
        from detectron2_tpu.ops.roi_align import roi_align_separable

        boxes_t = boxes.tensor if isinstance(boxes, Boxes) else boxes
        N = self.tensor.shape[0]
        assert boxes_t.shape[0] == N, f"{boxes_t.shape[0]} != {N}"
        if N == 0:
            return jnp.zeros((0, mask_size, mask_size), dtype=bool)

        # separable-matmul RoIAlign (single-channel maps run on the MXU
        # instead of the gather path; see ops.roi_align.roi_align_separable)
        output = roi_align_separable(
            jnp.asarray(self.tensor, jnp.float32),
            jnp.asarray(boxes_t, jnp.float32),
            jnp.arange(N, dtype=jnp.int32),
            output_size=(mask_size, mask_size),
            sampling_ratio=0,
            aligned=True,
        )  # [N, mask_size, mask_size]
        return output >= 0.5

    def get_bounding_boxes(self) -> Boxes:
        """Returns the tight bounding boxes around bitmasks.
        If a mask is empty, its bounding box will be all zero."""
        masks = np.asarray(self.tensor).astype(bool)
        n, h, w = masks.shape
        boxes = np.zeros((n, 4), dtype=np.float32)
        x_any = masks.any(axis=1)  # [n, w]
        y_any = masks.any(axis=2)  # [n, h]
        for idx in range(n):
            x = np.where(x_any[idx])[0]
            y = np.where(y_any[idx])[0]
            if len(x) > 0 and len(y) > 0:
                boxes[idx, :] = np.array([x[0], y[0], x[-1] + 1, y[-1] + 1], dtype=np.float32)
        return Boxes(boxes)

    @staticmethod
    def cat(bitmasks_list: List["BitMasks"]) -> "BitMasks":
        assert isinstance(bitmasks_list, (list, tuple))
        assert len(bitmasks_list) > 0
        assert all(isinstance(bitmask, BitMasks) for bitmask in bitmasks_list)
        tensors = [np.asarray(bm.tensor) for bm in bitmasks_list]
        return BitMasks(np.concatenate(tensors, axis=0))


class PolygonMasks:
    """Stores the segmentation masks for all objects in one image, as polygons
    (reference masks.py:263-466).

    Attributes:
        polygons: list[list[ndarray]]; each ndarray is a float64 vector of
            (x0, y0, x1, y1, ...) coordinates.
    """

    def __init__(self, polygons: List[List[Union[np.ndarray, Any]]]):
        if not isinstance(polygons, list):
            raise ValueError(
                "Cannot create PolygonMasks: Expect a list of list of polygons per image. "
                f"Got '{type(polygons)}' instead."
            )

        def _make_array(t) -> np.ndarray:
            return np.asarray(t).astype(np.float64)

        def process_polygons(polygons_per_instance) -> List[np.ndarray]:
            if not isinstance(polygons_per_instance, list):
                raise ValueError(
                    "Cannot create polygons: Expect a list of polygons per instance. "
                    f"Got '{type(polygons_per_instance)}' instead."
                )
            polygons_per_instance = [_make_array(p) for p in polygons_per_instance]
            for polygon in polygons_per_instance:
                if len(polygon) % 2 != 0 or len(polygon) < 6:
                    raise ValueError(f"Cannot create a polygon from {len(polygon)} coordinates.")
            return polygons_per_instance

        self.polygons: List[List[np.ndarray]] = [process_polygons(p) for p in polygons]

    def to(self, *args: Any, **kwargs: Any) -> "PolygonMasks":
        return self

    @property
    def device(self):
        return None

    def get_bounding_boxes(self) -> Boxes:
        """Returns the tight bounding boxes around polygon masks."""
        boxes = np.zeros((len(self.polygons), 4), dtype=np.float32)
        for idx, polygons_per_instance in enumerate(self.polygons):
            minxy = np.array([float("inf"), float("inf")])
            maxxy = np.zeros(2)
            for polygon in polygons_per_instance:
                coords = polygon.reshape(-1, 2)
                minxy = np.minimum(minxy, coords.min(axis=0))
                maxxy = np.maximum(maxxy, coords.max(axis=0))
            boxes[idx, :2] = minxy
            boxes[idx, 2:] = maxxy
        return Boxes(boxes)

    def nonempty(self) -> np.ndarray:
        """Boolean mask of masks with at least one polygon point."""
        keep = [1 if len(polygon) > 0 else 0 for polygon in self.polygons]
        return np.asarray(keep, dtype=bool)

    def __getitem__(self, item) -> "PolygonMasks":
        """Supports int, slice, list[int], and bool/integer numpy arrays."""
        if isinstance(item, int):
            selected_polygons = [self.polygons[item]]
        elif isinstance(item, slice):
            selected_polygons = self.polygons[item]
        elif isinstance(item, list):
            selected_polygons = [self.polygons[i] for i in item]
        else:
            item = np.asarray(item)
            if item.dtype == bool:
                assert item.ndim == 1, item.shape
                item = np.nonzero(item)[0]
            selected_polygons = [self.polygons[int(i)] for i in item]
        return PolygonMasks(selected_polygons)

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        yield from self.polygons

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(num_instances={len(self.polygons)})"

    def __len__(self) -> int:
        return len(self.polygons)

    def crop_and_resize(self, boxes, mask_size: int) -> jnp.ndarray:
        """Crop each mask by the given box and resize to (mask_size, mask_size)
        by rasterizing the polygons within the box on the host
        (reference masks.py:396-430)."""
        boxes_np = np.asarray(boxes.tensor if isinstance(boxes, Boxes) else boxes)
        assert boxes_np.shape[0] == len(self), f"{boxes_np.shape[0]} != {len(self)}"

        results = [
            rasterize_polygons_within_box(poly, box, mask_size)
            for poly, box in zip(self.polygons, boxes_np)
        ]
        if len(results) == 0:
            return jnp.zeros((0, mask_size, mask_size), dtype=bool)
        return jnp.asarray(np.stack(results))

    def area(self) -> np.ndarray:
        """Area of the masks computed from polygons, same as COCO's
        "area" field (reference masks.py:434)."""
        area = []
        for polygons_per_instance in self.polygons:
            area_per_instance = 0.0
            for p in polygons_per_instance:
                area_per_instance += polygon_area(p[0::2], p[1::2])
            area.append(area_per_instance)
        return np.asarray(area)

    @staticmethod
    def cat(polymasks_list: List["PolygonMasks"]) -> "PolygonMasks":
        assert isinstance(polymasks_list, (list, tuple))
        assert len(polymasks_list) > 0
        assert all(isinstance(pm, PolygonMasks) for pm in polymasks_list)
        return PolygonMasks(list(itertools.chain.from_iterable(pm.polygons for pm in polymasks_list)))


class ROIMasks:
    """Represent masks by N smaller masks defined in some ROIs; once the
    corresponding boxes are given, full-image bitmasks can be obtained by
    pasting (reference masks.py:468-540)."""

    def __init__(self, tensor):
        """
        Args:
            tensor: (N, M, M) float mask logits/probabilities within each ROI.
        """
        if tensor.ndim != 3:
            raise ValueError("ROIMasks must take a masks of 3 dimension.")
        self.tensor = tensor

    def to(self, *args, **kwargs) -> "ROIMasks":
        return self

    @property
    def device(self):
        return getattr(self.tensor, "devices", lambda: None)()

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "ROIMasks":
        t = self.tensor[item]
        if t.ndim != 3:
            raise ValueError(f"Indexing on ROIMasks with {item} returns a tensor with shape {t.shape}!")
        return ROIMasks(t)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(num_instances={len(self.tensor)})"

    def to_bitmasks(self, boxes, height: int, width: int, threshold: float = 0.5) -> BitMasks:
        """Paste the ROI masks into full-image bitmasks via
        ops.paste_masks_in_image (reference masks.py:522 → mask_ops.py:74)."""
        from detectron2_tpu.ops.paste_masks import paste_masks_in_image

        boxes_t = boxes.tensor if isinstance(boxes, Boxes) else boxes
        paste = paste_masks_in_image(
            jnp.asarray(self.tensor),
            jnp.asarray(boxes_t),
            (height, width),
            threshold=threshold,
        )
        return BitMasks(paste)
