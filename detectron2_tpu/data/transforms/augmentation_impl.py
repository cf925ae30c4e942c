"""Concrete augmentation policies.

Functional parity with reference detectron2/data/transforms/augmentation_impl.py.

A note on what is intentionally matched to the reference, because training
recipes and their published AP depend on it:

- the *distributions* each policy samples from (uniform vs randint ranges,
  "range" vs "choice" styles, retry counts, IoU thresholds, the 0.5-rounding
  of output sizes) are kept semantically identical;
- the deterministic geometry (ResizeShortestEdge.get_output_shape's
  short-edge/max-size arithmetic, ResizeScale's aspect-preserving fit,
  FixedSizeCrop's crop-then-pad decomposition) is value-identical.

Everything else — structure, helper factoring, RNG call order inside one
policy — is this framework's own; matching the reference's RNG *streams* is
neither needed nor attempted (its own runs differ per seed anyway).
"""

import sys
from typing import List, Optional, Tuple, Union

import numpy as np

from detectron2_tpu.data.transforms.augmentation import Augmentation, _transform_to_aug
from detectron2_tpu.data.transforms.transform import (
    BlendTransform,
    CropTransform,
    ExtentTransform,
    HFlipTransform,
    NoOpTransform,
    PadTransform,
    ResizeTransform,
    RotationTransform,
    Transform,
    TransformList,
    VFlipTransform,
)

__all__ = [
    "FixedSizeCrop",
    "RandomApply",
    "RandomBrightness",
    "RandomContrast",
    "RandomCrop",
    "RandomExtent",
    "RandomFlip",
    "RandomSaturation",
    "RandomLighting",
    "RandomRotation",
    "Resize",
    "ResizeScale",
    "ResizeShortestEdge",
    "RandomCrop_CategoryAreaConstraint",
    "MinIoURandomCrop",
]


class RandomApply(Augmentation):
    """Apply a wrapped augmentation with a given probability."""

    def __init__(self, tfm_or_aug, prob=0.5):
        super().__init__()
        self.aug = _transform_to_aug(tfm_or_aug)
        assert 0.0 <= prob <= 1.0, f"Probablity must be between 0.0 and 1.0 (given: {prob})"
        self.prob = prob

    def get_transform(self, *args):
        do = self._rand_range() < self.prob
        if do:
            return self.aug.get_transform(*args)
        return NoOpTransform()

    def __call__(self, aug_input):
        do = self._rand_range() < self.prob
        if do:
            return self.aug(aug_input)
        return NoOpTransform()


class RandomFlip(Augmentation):
    """Flip the image horizontally or vertically with probability prob
    (reference augmentation_impl.py:82)."""

    def __init__(self, prob=0.5, *, horizontal=True, vertical=False):
        super().__init__()
        if horizontal == vertical:
            raise ValueError(
                "Exactly one of horizontal/vertical must be set; compose two "
                "RandomFlip augmentations to get both."
            )
        self._init(locals())

    def get_transform(self, image):
        if self._rand_range() >= self.prob:
            return NoOpTransform()
        h, w = image.shape[:2]
        return HFlipTransform(w) if self.horizontal else VFlipTransform(h)


class Resize(Augmentation):
    """Resize to a fixed target size."""

    def __init__(self, shape, interp="bilinear"):
        if isinstance(shape, int):
            shape = (shape, shape)
        shape = tuple(shape)
        self._init(locals())

    def get_transform(self, image):
        return ResizeTransform(image.shape[0], image.shape[1], self.shape[0], self.shape[1], self.interp)


class ResizeShortestEdge(Augmentation):
    """Resize so the shorter edge hits a target, capping the longer edge
    (reference augmentation_impl.py:134) — the COCO standard policy."""

    def __init__(
        self, short_edge_length, max_size=sys.maxsize, sample_style="range", interp="bilinear"
    ):
        super().__init__()
        if sample_style not in ("range", "choice"):
            raise ValueError(f"unknown sample_style {sample_style!r}")
        self.is_range = sample_style == "range"
        if isinstance(short_edge_length, int):
            short_edge_length = (short_edge_length, short_edge_length)
        if self.is_range and len(short_edge_length) != 2:
            raise ValueError(
                f"'range' style needs a (lo, hi) pair, got {short_edge_length}"
            )
        self._init(locals())

    def _sample_short_edge(self) -> int:
        lo_hi = self.short_edge_length
        if self.is_range:
            return int(np.random.randint(lo_hi[0], lo_hi[1] + 1))
        return int(np.random.choice(lo_hi))

    def get_transform(self, image):
        target = self._sample_short_edge()
        if target == 0:
            return NoOpTransform()
        h, w = image.shape[:2]
        newh, neww = ResizeShortestEdge.get_output_shape(h, w, target, self.max_size)
        return ResizeTransform(h, w, newh, neww, self.interp)

    @staticmethod
    def get_output_shape(
        oldh: int, oldw: int, short_edge_length: int, max_size: int
    ) -> Tuple[int, int]:
        """Output (h, w): short edge scaled to the target, long edge capped at
        max_size, both rounded half-up — value-identical to the reference
        (augmentation_impl.py:180-198); the rounding is AP-relevant."""
        scale = float(short_edge_length) / min(oldh, oldw)
        nh, nw = oldh * scale, oldw * scale
        longest = max(nh, nw)
        if longest > max_size:
            nh, nw = nh * max_size / longest, nw * max_size / longest
        return int(nh + 0.5), int(nw + 0.5)


class ResizeScale(Augmentation):
    """Large-scale jitter: random scale in [min, max] of a target size, then
    resize preserving aspect ratio (reference augmentation_impl.py:203; the
    LSJ recipe pairs this with FixedSizeCrop)."""

    def __init__(self, min_scale: float, max_scale: float, target_height: int, target_width: int, interp="bilinear"):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        h, w = image.shape[:2]
        scale = np.random.uniform(self.min_scale, self.max_scale)
        # fit (h, w) inside the scaled target box, preserving aspect ratio
        fit = min(self.target_height * scale / h, self.target_width * scale / w)
        out_h = int(round(h * fit))
        out_w = int(round(w * fit))
        return ResizeTransform(h, w, out_h, out_w, self.interp)


class FixedSizeCrop(Augmentation):
    """Crop (random position) and/or pad to a fixed square size
    (reference augmentation_impl.py:307)."""

    def __init__(self, crop_size: Tuple[int, int], pad: bool = True, pad_value: float = 128.0, seg_pad_value: int = 255):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        h, w = image.shape[:2]
        out_h, out_w = self.crop_size

        # random-position crop of at most crop_size (one shared fraction for
        # both axes, like the reference)
        u = np.random.uniform(0.0, 1.0)
        y0 = int(round(max(h - out_h, 0) * u))
        x0 = int(round(max(w - out_w, 0) * u))
        crop = CropTransform(x0, y0, min(out_w, w - x0), min(out_h, h - y0), w, h)
        if not self.pad:
            return TransformList([crop])

        # then zero-pad bottom/right up to exactly crop_size
        ch, cw = min(h, out_h), min(w, out_w)
        pad = PadTransform(
            0, 0, max(out_w - w, 0), max(out_h - h, 0), cw, ch, self.pad_value
        )
        return TransformList([crop, pad])


class RandomCrop(Augmentation):
    """Random crop with relative / relative_range / absolute / absolute_range
    semantics (reference augmentation_impl.py:373)."""

    def __init__(self, crop_type: str, crop_size):
        super().__init__()
        assert crop_type in ["relative_range", "relative", "absolute", "absolute_range"]
        self._init(locals())

    def get_transform(self, image):
        h, w = image.shape[:2]
        croph, cropw = self.get_crop_size((h, w))
        if croph > h or cropw > w:
            raise RuntimeError(f"crop {croph}x{cropw} larger than image {h}x{w} in {self}")
        y0 = int(np.random.randint(h - croph + 1))
        x0 = int(np.random.randint(w - cropw + 1))
        return CropTransform(x0, y0, cropw, croph)

    def get_crop_size(self, image_size):
        """Sampled (crop_h, crop_w). The four styles and their rounding match
        the reference (augmentation_impl.py:404-435)."""
        h, w = image_size
        kind = self.crop_type
        if kind == "relative":
            fh, fw = self.crop_size
        elif kind == "relative_range":
            lo = np.asarray(self.crop_size, dtype=np.float32)
            fh, fw = lo + np.random.rand(2) * (1 - lo)
        elif kind == "absolute":
            return min(self.crop_size[0], h), min(self.crop_size[1], w)
        elif kind == "absolute_range":
            lo, hi = self.crop_size
            assert lo <= hi, self.crop_size
            return (
                int(np.random.randint(min(h, lo), min(h, hi) + 1)),
                int(np.random.randint(min(w, lo), min(w, hi) + 1)),
            )
        else:
            raise NotImplementedError(f"Unknown crop type {kind}")
        # the two relative styles share the half-up rounding
        return int(h * fh + 0.5), int(w * fw + 0.5)


class RandomCrop_CategoryAreaConstraint(Augmentation):
    """RandomCrop retried so no single category exceeds an area fraction of
    the crop (semantic segmentation; reference augmentation_impl.py:436)."""

    def __init__(self, crop_type: str, crop_size, single_category_max_area: float = 1.0, ignored_category: Optional[int] = None):
        super().__init__()
        self.crop_aug = RandomCrop(crop_type, crop_size)
        self._init(locals())

    def _area_ok(self, window) -> bool:
        """No single (non-ignored) category may dominate the window."""
        labels, counts = np.unique(window, return_counts=True)
        if self.ignored_category is not None:
            counts = counts[labels != self.ignored_category]
        return len(counts) > 1 and counts.max() < counts.sum() * self.single_category_max_area

    def get_transform(self, image, sem_seg):
        if self.single_category_max_area >= 1.0:
            return self.crop_aug.get_transform(image)
        # up to 10 resamples, keeping the last candidate if none qualifies
        # (reference augmentation_impl.py:462-476)
        h, w = sem_seg.shape
        for _ in range(10):
            ch, cw = self.crop_aug.get_crop_size((h, w))
            y0 = int(np.random.randint(h - ch + 1))
            x0 = int(np.random.randint(w - cw + 1))
            if self._area_ok(sem_seg[y0 : y0 + ch, x0 : x0 + cw]):
                break
        return CropTransform(x0, y0, cw, ch)


class RandomExtent(Augmentation):
    """Random sub-rect (possibly out of bounds) resampled to its own size
    (reference augmentation_impl.py:486)."""

    def __init__(self, scale_range, shift_range):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        h, w = image.shape[:2]
        # a scaled, shifted window around the image center; RNG order (scale,
        # x-shift, y-shift) matches the reference's distribution
        s = np.random.uniform(self.scale_range[0], self.scale_range[1])
        dx = self.shift_range[0] * w * (np.random.rand() - 0.5)
        dy = self.shift_range[1] * h * (np.random.rand() - 0.5)
        cx, cy = 0.5 * w + dx, 0.5 * h + dy
        half_w, half_h = 0.5 * w * s, 0.5 * h * s
        x0, y0 = cx - half_w, cy - half_h
        x1, y1 = cx + half_w, cy + half_h
        return ExtentTransform(
            src_rect=(x0, y0, x1, y1),
            output_size=(int(y1 - y0), int(x1 - x0)),
        )


class RandomContrast(Augmentation):
    """Contrast jitter: blend with the mean intensity."""

    def __init__(self, intensity_min, intensity_max):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(src_image=image.mean(), src_weight=1 - w, dst_weight=w)


class RandomBrightness(Augmentation):
    """Brightness jitter: blend with black."""

    def __init__(self, intensity_min, intensity_max):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(src_image=0, src_weight=1 - w, dst_weight=w)


class RandomSaturation(Augmentation):
    """Saturation jitter: blend with the grayscale image (expects RGB)."""

    def __init__(self, intensity_min, intensity_max):
        super().__init__()
        self._init(locals())

    def get_transform(self, image):
        assert image.shape[-1] == 3, "RandomSaturation only works on RGB images"
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        grayscale = image.dot([0.299, 0.587, 0.114])[:, :, np.newaxis]
        return BlendTransform(src_image=grayscale, src_weight=1 - w, dst_weight=w)


class RandomLighting(Augmentation):
    """AlexNet-style PCA lighting jitter (expects RGB)."""

    def __init__(self, scale):
        super().__init__()
        self._init(locals())
        self.eigen_vecs = np.array(
            [[-0.5675, 0.7192, 0.4009], [-0.5808, -0.0045, -0.814], [-0.5836, -0.6948, 0.4203]]
        )
        self.eigen_vals = np.array([0.2175, 0.0188, 0.0045])

    def get_transform(self, image):
        assert image.shape[-1] == 3, "RandomLighting only works on RGB images"
        weights = np.random.normal(scale=self.scale, size=3)
        return BlendTransform(
            src_image=self.eigen_vecs.dot(weights * self.eigen_vals), src_weight=1.0, dst_weight=1.0
        )


class RandomRotation(Augmentation):
    """Random rotation around the center (reference augmentation_impl.py:253)."""

    def __init__(self, angle, expand=True, center=None, sample_style="range", interp="bilinear"):
        super().__init__()
        if sample_style not in ("range", "choice"):
            raise ValueError(f"unknown sample_style {sample_style!r}")
        self.is_range = sample_style == "range"
        if isinstance(angle, (float, int)):
            angle = (angle, angle)
        if center is not None and isinstance(center[0], (float, int)):
            center = (center, center)
        self._init(locals())

    def get_transform(self, image):
        angle = (
            np.random.uniform(*self.angle) if self.is_range else np.random.choice(self.angle)
        )
        if angle % 360 == 0:
            return NoOpTransform()
        h, w = image.shape[:2]
        return RotationTransform(
            h, w, angle, expand=self.expand, center=self._sample_center(h, w), interp=self.interp
        )

    def _sample_center(self, h, w):
        """Sample a rotation center in absolute pixels from the relative
        [0, 1] x [0, 1] center spec (None = image center)."""
        if self.center is None:
            return None
        if self.is_range:
            rel = (
                np.random.uniform(self.center[0][0], self.center[1][0]),
                np.random.uniform(self.center[0][1], self.center[1][1]),
            )
        else:
            rel = np.random.choice(self.center)
        return (w * rel[0], h * rel[1])


class MinIoURandomCrop(Augmentation):
    """Crop keeping at least one box with IoU above a sampled constraint
    (SSD-style; reference augmentation_impl.py:654)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        super().__init__()
        self._init(locals())

    def get_transform(self, image, boxes):
        if boxes is None or len(boxes) == 0:
            return NoOpTransform()
        h, w = image.shape[:2]
        while True:
            mode = np.random.choice((1, *self.min_ious))
            if mode == 1:
                return NoOpTransform()
            min_iou = mode
            for _ in range(50):
                new_w = np.random.uniform(self.min_crop_size * w, w)
                new_h = np.random.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = np.random.uniform(w - new_w)
                top = np.random.uniform(h - new_h)
                patch = np.array([int(left), int(top), int(left + new_w), int(top + new_h)])

                def _ioa(boxes, patch):
                    lt = np.maximum(boxes[:, :2], patch[:2])
                    rb = np.minimum(boxes[:, 2:], patch[2:])
                    inter = np.prod(np.clip(rb - lt, 0, None), axis=1)
                    area = np.prod(boxes[:, 2:] - boxes[:, :2], axis=1)
                    parea = (patch[2] - patch[0]) * (patch[3] - patch[1])
                    return inter / np.maximum(area + parea - inter, 1e-12)

                overlaps = _ioa(np.asarray(boxes, np.float64), patch)
                if len(overlaps) > 0 and overlaps.min() < min_iou:
                    continue
                centers = (np.asarray(boxes)[:, :2] + np.asarray(boxes)[:, 2:]) / 2
                mask = (
                    (centers[:, 0] > patch[0]) & (centers[:, 1] > patch[1])
                    & (centers[:, 0] < patch[2]) & (centers[:, 1] < patch[3])
                )
                if not mask.any():
                    continue
                return CropTransform(patch[0], patch[1], patch[2] - patch[0], patch[3] - patch[1])
