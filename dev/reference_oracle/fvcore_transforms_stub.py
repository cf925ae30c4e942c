"""Shim for fvcore.transforms.transform — the deterministic Transform ABC and
the handful of concrete transforms the reference's data pipeline builds on.
Implemented from fvcore's published API semantics (Transform = pair of
apply_image/apply_coords, box/polygon/segmentation derived; TransformList
composes)."""

import inspect
import pprint
from abc import ABCMeta, abstractmethod
from typing import Any, Callable, List, Optional, TypeVar

import numpy as np

__all__ = [
    "Transform",
    "TransformList",
    "HFlipTransform",
    "VFlipTransform",
    "NoOpTransform",
    "CropTransform",
    "BlendTransform",
    "PadTransform",
    "ScaleTransform",
    "GridSampleTransform",
]


class Transform(metaclass=ABCMeta):
    """A deterministic image+geometry transform."""

    def _set_attributes(self, params: Optional[dict] = None) -> None:
        if params:
            for k, v in params.items():
                if k != "self" and not k.startswith("_"):
                    setattr(self, k, v)

    @abstractmethod
    def apply_image(self, img: np.ndarray):
        pass

    @abstractmethod
    def apply_coords(self, coords: np.ndarray):
        pass

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation)

    def apply_box(self, box: np.ndarray) -> np.ndarray:
        # transform the 4 corners, then take the axis-aligned hull
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape((-1, 4, 2))
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_polygons(self, polygons: list) -> list:
        return [self.apply_coords(np.asarray(p, dtype=np.float64)) for p in polygons]

    @classmethod
    def register_type(cls, data_type: str, func: Optional[Callable] = None):
        if func is None:

            def wrapper(decorated_func):
                cls.register_type(data_type, decorated_func)
                return decorated_func

            return wrapper
        argspec = inspect.getfullargspec(func)
        assert len(argspec.args) == 2, "register_type function must take (transform, data)"
        setattr(cls, "apply_" + data_type, func)

    def inverse(self) -> "Transform":
        raise NotImplementedError

    def __repr__(self):
        try:
            sig = inspect.signature(self.__init__)
            argstr = []
            for name, param in sig.parameters.items():
                if name == "self":
                    continue
                attr = getattr(self, name, None)
                argstr.append("{}={}".format(name, pprint.pformat(attr)))
            return "{}({})".format(type(self).__name__, ", ".join(argstr))
        except Exception:
            return super().__repr__()


_T = TypeVar("_T")


class TransformList(Transform):
    def __init__(self, transforms: List[Transform]):
        super().__init__()
        tfms_flatten = []
        for t in transforms:
            assert isinstance(t, Transform), t
            if isinstance(t, TransformList):
                tfms_flatten.extend(t.transforms)
            else:
                tfms_flatten.append(t)
        self.transforms = tfms_flatten

    def _apply(self, x: _T, meth: str) -> _T:
        for t in self.transforms:
            x = getattr(t, meth)(x)
        return x

    def __getattribute__(self, name: str):
        # generic dispatch for apply_*
        if name.startswith("apply_"):
            return lambda x: self._apply(x, name)
        return super().__getattribute__(name)

    def apply_image(self, x):  # pragma: no cover — routed via __getattribute__
        return self._apply(x, "apply_image")

    def apply_coords(self, x):  # pragma: no cover
        return self._apply(x, "apply_coords")

    def __add__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + others)

    def __iadd__(self, other):
        others = other.transforms if isinstance(other, TransformList) else [other]
        self.transforms.extend(others)
        return self

    def __radd__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(others + self.transforms)

    def __len__(self) -> int:
        return len(self.transforms)

    def __getitem__(self, idx) -> Transform:
        return self.transforms[idx]

    def inverse(self) -> "TransformList":
        return TransformList([t.inverse() for t in self.transforms[::-1]])


class HFlipTransform(Transform):
    def __init__(self, width: int):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim <= 3:  # HW / HWC
            return np.flip(img, axis=1)
        return np.flip(img, axis=-2)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def inverse(self) -> Transform:
        return self


class VFlipTransform(Transform):
    def __init__(self, height: int):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if img.ndim <= 3:
            return np.flip(img, axis=0)
        return np.flip(img, axis=-3)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords).copy()
        coords[:, 1] = self.height - coords[:, 1]
        return coords

    def inverse(self) -> Transform:
        return self


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def inverse(self) -> Transform:
        return self

    def __getattr__(self, name: str):
        if name.startswith("apply_"):
            return lambda x: x
        raise AttributeError("NoOpTransform object has no attribute {}".format(name))


class CropTransform(Transform):
    def __init__(self, x0, y0, w, h, orig_w=None, orig_h=None):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        if len(img.shape) <= 3:
            return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]
        return img[..., self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w, :]

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords

    def apply_polygons(self, polygons: list) -> list:
        import shapely.geometry as geometry

        crop_box = geometry.box(self.x0, self.y0, self.x0 + self.w, self.y0 + self.h).buffer(
            0.0
        )
        cropped = []
        for polygon in polygons:
            polygon = geometry.Polygon(polygon).buffer(0.0)
            polygon = polygon.intersection(crop_box)
            if polygon.is_empty:
                continue
            if not isinstance(polygon, geometry.MultiPolygon):
                polygon = geometry.MultiPolygon([polygon])
            for poly in polygon.geoms:
                coords = np.asarray(poly.exterior.coords)
                cropped.append(self.apply_coords(coords[:-1]))
        return cropped

    def inverse(self) -> Transform:
        assert (
            self.orig_w is not None and self.orig_h is not None
        ), "orig_w, orig_h required for CropTransform.inverse"
        pad_x1 = self.orig_w - self.x0 - self.w
        pad_y1 = self.orig_h - self.y0 - self.h
        return PadTransform(self.x0, self.y0, pad_x1, pad_y1, self.w, self.h)


class PadTransform(Transform):
    def __init__(self, x0, y0, x1, y1, orig_w=None, orig_h=None, pad_value=0.0, seg_pad_value=0):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img):
        if img.ndim == 3:
            padding = ((self.y0, self.y1), (self.x0, self.x1), (0, 0))
        else:
            padding = ((self.y0, self.y1), (self.x0, self.x1))
        return np.pad(img, padding, mode="constant", constant_values=self.pad_value)

    def apply_segmentation(self, img):
        if img.ndim == 3:
            padding = ((self.y0, self.y1), (self.x0, self.x1), (0, 0))
        else:
            padding = ((self.y0, self.y1), (self.x0, self.x1))
        return np.pad(img, padding, mode="constant", constant_values=self.seg_pad_value)

    def apply_coords(self, coords):
        coords = np.asarray(coords).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def inverse(self) -> Transform:
        assert (
            self.orig_w is not None and self.orig_h is not None
        ), "orig_w, orig_h required for PadTransform.inverse"
        return CropTransform(
            self.x0, self.y0, self.orig_w, self.orig_h, self.orig_w + self.x0 + self.x1,
            self.orig_h + self.y0 + self.y1,
        )


class BlendTransform(Transform):
    def __init__(self, src_image: np.ndarray, src_weight: float, dst_weight: float):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: str = None) -> np.ndarray:
        if img.dtype == np.uint8:
            img = img.astype(np.float32)
            img = self.src_weight * self.src_image + self.dst_weight * img
            return np.clip(img, 0, 255).astype(np.uint8)
        return self.src_weight * self.src_image + self.dst_weight * img

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return segmentation

    def inverse(self) -> Transform:
        raise NotImplementedError


class ScaleTransform(Transform):
    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp: str = None):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: str = None) -> np.ndarray:
        from PIL import Image

        interp_method = interp if interp is not None else self.interp
        pil = Image.fromarray(img)
        pil = pil.resize((self.new_w, self.new_h), getattr(Image, (interp_method or "BILINEAR")))
        return np.asarray(pil)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords).copy().astype(np.float64)
        coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
        coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
        return coords

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation, interp="NEAREST")

    def inverse(self) -> Transform:
        return ScaleTransform(self.new_h, self.new_w, self.h, self.w, self.interp)


class GridSampleTransform(Transform):
    def __init__(self, grid: np.ndarray, interp: str):
        super().__init__()
        self._set_attributes(locals())

    def apply_image(self, img: np.ndarray, interp: str = None) -> np.ndarray:
        import torch
        from torch.nn import functional as F

        interp_method = interp if interp is not None else self.interp
        float_tensor = torch.from_numpy(img).permute(2, 0, 1).float()[None]
        grid = torch.from_numpy(self.grid)
        out = F.grid_sample(float_tensor, grid, mode=interp_method, align_corners=False)
        return out[0].permute(1, 2, 0).numpy().astype(img.dtype)

    def apply_coords(self, coords: np.ndarray):
        raise NotImplementedError

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation, interp="nearest")
