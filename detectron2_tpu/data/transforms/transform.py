"""Deterministic transforms: invertible image+geometry ops on the host.

The host-side analogue of the reference's fvcore Transform hierarchy
(detectron2/data/transforms/transform.py): each Transform deterministically
maps image / coords / boxes / polygons / segmentation together. These run in
the input pipeline on CPU (numpy/cv2/PIL); device code never sees them.
"""

from typing import Any, Callable, List, Optional, Tuple

import numpy as np

__all__ = [
    "Transform",
    "TransformList",
    "NoOpTransform",
    "HFlipTransform",
    "VFlipTransform",
    "ResizeTransform",
    "CropTransform",
    "PadTransform",
    "BlendTransform",
    "ExtentTransform",
    "RotationTransform",
    "ColorTransform",
    "PILColorTransform",
]


class Transform:
    """Base class for deterministic transforms."""

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        """coords: [N, 2] float array of (x, y)."""
        raise NotImplementedError

    def apply_box(self, box: np.ndarray) -> np.ndarray:
        """box: [N, 4] XYXY. Default: transform the 4 corners and take the
        axis-aligned envelope (correct for flips/resizes; conservative for
        rotations)."""
        box = np.asarray(box, dtype=np.float64).reshape(-1, 4)
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = box[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape(-1, 4, 2)
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_polygons(self, polygons: List[np.ndarray]) -> List[np.ndarray]:
        return [self.apply_coords(np.asarray(p, dtype=np.float64).reshape(-1, 2)).reshape(-1) for p in polygons]

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation)

    def inverse(self) -> "Transform":
        raise NotImplementedError

    def __add__(self, other):
        t1 = self.transforms if isinstance(self, TransformList) else [self]
        t2 = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(t1 + t2)


class TransformList(Transform):
    """Composition of transforms, applied in order."""

    def __init__(self, transforms: List[Transform]):
        flat = []
        for t in transforms:
            if isinstance(t, TransformList):
                flat.extend(t.transforms)
            else:
                flat.append(t)
        self.transforms = flat

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def apply_box(self, box):
        for t in self.transforms:
            box = t.apply_box(box)
        return box

    def apply_polygons(self, polygons):
        for t in self.transforms:
            polygons = t.apply_polygons(polygons)
        return polygons

    def inverse(self) -> "TransformList":
        return TransformList([t.inverse() for t in self.transforms[::-1]])

    def __len__(self):
        return len(self.transforms)

    def __getitem__(self, i):
        return self.transforms[i]


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def inverse(self):
        return self


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def inverse(self):
        return self


class VFlipTransform(Transform):
    def __init__(self, height: int):
        self.height = height

    def apply_image(self, img):
        return np.ascontiguousarray(img[::-1])

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 1] = self.height - coords[:, 1]
        return coords

    def inverse(self):
        return self


class ResizeTransform(Transform):
    """Resize image with a chosen interpolation; coords scale linearly
    (reference transforms/transform.py:94)."""

    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp: Optional[str] = None):
        self.h, self.w = h, w
        self.new_h, self.new_w = new_h, new_w
        self.interp = interp or "bilinear"

    def apply_image(self, img, interp: Optional[str] = None):
        """Pixel-exact reference semantics (transform.py:112-147): uint8 goes
        through PIL (whose BILINEAR is antialiased on downscale — cv2's
        INTER_LINEAR differs by up to ~60/255 there), float through a plain
        bilinear (torch F.interpolate align_corners=False ≙ cv2 INTER_LINEAR)."""
        import cv2
        from PIL import Image

        assert img.shape[:2] == (self.h, self.w), (img.shape, (self.h, self.w))
        method = interp or self.interp
        if img.dtype == np.uint8 and method in ("nearest", "bilinear", "bicubic"):
            pil_interp = {
                "nearest": Image.NEAREST,
                "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC,
            }[method]
            squeeze = img.ndim == 3 and img.shape[2] == 1
            pil_image = Image.fromarray(img[:, :, 0] if squeeze else img)
            out = np.asarray(pil_image.resize((self.new_w, self.new_h), pil_interp))
            if squeeze:
                out = out[:, :, None]
            return out
        cv_interp = {
            "nearest": cv2.INTER_NEAREST,
            "bilinear": cv2.INTER_LINEAR,
            "bicubic": cv2.INTER_CUBIC,
            "area": cv2.INTER_AREA,
        }[method]
        out = cv2.resize(img, (self.new_w, self.new_h), interpolation=cv_interp)
        if img.ndim == 3 and out.ndim == 2:
            out = out[:, :, None]
        return out

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
        coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
        return coords

    def apply_segmentation(self, segmentation):
        return self.apply_image(segmentation, interp="nearest")

    def inverse(self):
        return ResizeTransform(self.new_h, self.new_w, self.h, self.w, self.interp)


class CropTransform(Transform):
    def __init__(self, x0: int, y0: int, w: int, h: int, orig_w: Optional[int] = None, orig_h: Optional[int] = None):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h
        self.orig_w, self.orig_h = orig_w, orig_h

    def apply_image(self, img):
        if len(img.shape) <= 3:
            return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]
        return img[..., self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w, :]

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords

    def apply_polygons(self, polygons):
        """Crop polygons by clipping to the crop window (shapely-free: clip
        each coordinate; exact boundary clipping only matters for sliver
        polygons)."""
        out = []
        for p in polygons:
            coords = np.asarray(p, dtype=np.float64).reshape(-1, 2)
            coords[:, 0] = np.clip(coords[:, 0], self.x0, self.x0 + self.w) - self.x0
            coords[:, 1] = np.clip(coords[:, 1], self.y0, self.y0 + self.h) - self.y0
            out.append(coords.reshape(-1))
        return out

    def inverse(self):
        assert self.orig_w is not None and self.orig_h is not None, "Crop inverse needs original size"
        return PadTransform(
            self.x0, self.y0, self.orig_w - self.x0 - self.w, self.orig_h - self.y0 - self.h, self.w, self.h
        )


class PadTransform(Transform):
    def __init__(self, x0: int, y0: int, x1: int, y1: int, orig_w=None, orig_h=None, pad_value: float = 0):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.orig_w, self.orig_h = orig_w, orig_h
        self.pad_value = pad_value

    def apply_image(self, img):
        pads = [(self.y0, self.y1), (self.x0, self.x1)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pads, mode="constant", constant_values=self.pad_value)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def inverse(self):
        assert self.orig_w is not None and self.orig_h is not None
        return CropTransform(self.x0, self.y0, self.orig_w, self.orig_h)


class BlendTransform(Transform):
    """dst = src_weight * src_image + dst_weight * img (color jitter core)."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img):
        if img.dtype == np.uint8:
            img = img.astype(np.float32)
            out = self.src_weight * self.src_image + self.dst_weight * img
            return np.clip(out, 0, 255).astype(np.uint8)
        return self.src_weight * self.src_image + self.dst_weight * img

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg

    def inverse(self):
        raise NotImplementedError


class ExtentTransform(Transform):
    """Extract a (possibly out-of-bounds) sub-rect and resize it
    (reference transform.py:36)."""

    def __init__(self, src_rect, output_size, interp: str = "bilinear", fill: float = 0):
        self.src_rect = src_rect
        self.output_size = output_size
        self.interp = interp
        self.fill = fill

    def apply_image(self, img):
        import cv2

        h, w = self.output_size
        x0, y0, x1, y1 = self.src_rect
        src = np.float32([[x0, y0], [x1, y0], [x0, y1]])
        dst = np.float32([[0, 0], [w, 0], [0, h]])
        M = cv2.getAffineTransform(src, dst)
        return cv2.warpAffine(
            img, M, (w, h),
            flags=cv2.INTER_LINEAR if self.interp == "bilinear" else cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_CONSTANT, borderValue=self.fill,
        )

    def apply_coords(self, coords):
        h, w = self.output_size
        x0, y0, x1, y1 = self.src_rect
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = (coords[:, 0] - x0) / (x1 - x0) * w
        coords[:, 1] = (coords[:, 1] - y0) / (y1 - y0) * h
        return coords

    def apply_segmentation(self, seg):
        import cv2

        h, w = self.output_size
        x0, y0, x1, y1 = self.src_rect
        src = np.float32([[x0, y0], [x1, y0], [x0, y1]])
        dst = np.float32([[0, 0], [w, 0], [0, h]])
        M = cv2.getAffineTransform(src, dst)
        return cv2.warpAffine(seg, M, (w, h), flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    def inverse(self):
        raise NotImplementedError


class RotationTransform(Transform):
    """Rotate the image around its center, optionally expanding to fit
    (reference transform.py:162)."""

    def __init__(self, h, w, angle, expand=True, center=None, interp: str = "bilinear"):
        import cv2

        self.h, self.w = h, w
        self.angle = angle
        self.expand = expand
        if center is None:
            center = ((w - 1) / 2, (h - 1) / 2)
        self.center = center
        self.interp = interp
        abs_cos, abs_sin = abs(np.cos(np.deg2rad(angle))), abs(np.sin(np.deg2rad(angle)))
        if expand:
            self.bound_w = int(np.rint(h * abs_sin + w * abs_cos))
            self.bound_h = int(np.rint(h * abs_cos + w * abs_sin))
        else:
            self.bound_w, self.bound_h = w, h
        self.rm_coords = self._create_rotation_matrix()
        self.rm_image = self._create_rotation_matrix(offset=-0.5)

    def _create_rotation_matrix(self, offset=0.0):
        import cv2

        center = (self.center[0] + offset, self.center[1] + offset)
        rm = cv2.getRotationMatrix2D(tuple(center), self.angle, 1)
        if self.expand:
            rot_im_center = cv2.transform(np.array([[self.center]]) + offset, rm)[0, 0, :]
            new_center = np.array([self.bound_w / 2, self.bound_h / 2]) + offset - rot_im_center
            rm[:, 2] += new_center
        return rm

    def apply_image(self, img, interp=None):
        import cv2

        if len(img) == 0 or self.angle % 360 == 0:
            return img
        assert img.shape[:2] == (self.h, self.w)
        interp = interp or self.interp
        flags = cv2.INTER_LINEAR if interp == "bilinear" else cv2.INTER_NEAREST
        return cv2.warpAffine(img, self.rm_image, (self.bound_w, self.bound_h), flags=flags)

    def apply_coords(self, coords):
        import cv2

        coords = np.asarray(coords, dtype=float)
        if len(coords) == 0 or self.angle % 360 == 0:
            return coords
        return cv2.transform(coords[:, np.newaxis, :], self.rm_coords)[:, 0, :]

    def apply_segmentation(self, segmentation):
        return self.apply_image(segmentation, interp="nearest")

    def inverse(self):
        """The inverse is a rotation the other way, cropped back to the
        original size."""
        if not self.expand:
            raise NotImplementedError
        rotation = RotationTransform(
            self.bound_h, self.bound_w, -self.angle, True, None, self.interp
        )
        crop = CropTransform(
            (rotation.bound_w - self.w) // 2, (rotation.bound_h - self.h) // 2, self.w, self.h
        )
        return TransformList([rotation, crop])


class ColorTransform(Transform):
    """Photometric-only transform via an arbitrary function."""

    def __init__(self, op: Callable):
        assert callable(op)
        self.op = op

    def apply_image(self, img):
        return self.op(img)

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg

    def inverse(self):
        return NoOpTransform()


class PILColorTransform(ColorTransform):
    def apply_image(self, img):
        from PIL import Image

        img = Image.fromarray(img)
        return np.asarray(super().apply_image(img))
