"""DensePose output converters
(reference projects/DensePose/densepose/converters/{base,builtin,
chart_output_to_chart_result,segm_to_mask}.py), numpy host-side.

Turn the model's padded per-detection chart maps (coarse_segm / fine_segm /
u / v, each [S, S, C] in the detection-box frame) into user-facing
:class:`DensePoseChartResult` objects (per-pixel labels + UV at box
resolution) or full-image BitMasks.
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from detectron2_tpu.projects.densepose.structures import (
    DensePoseChartResult,
    DensePoseChartResultWithConfidences,
)
from detectron2_tpu.structures import BitMasks, Boxes, BoxMode

__all__ = [
    "make_int_box",
    "resample_fine_and_coarse_segm_tensors_to_bbox",
    "resample_uv_tensors_to_bbox",
    "densepose_chart_predictor_output_to_result",
    "densepose_chart_predictor_output_to_result_with_confidences",
    "predictor_output_with_coarse_segm_to_mask",
    "ToChartResultConverter",
    "ToChartResultConverterWithConfidences",
    "ToMaskConverter",
]


def make_int_box(box_xywh) -> Tuple[int, int, int, int]:
    """(reference converters/base.py:14-19): int truncation of XYWH."""
    return tuple(int(v) for v in np.asarray(box_xywh, np.float64).reshape(-1)[:4].tolist())


def _resize_chw(maps: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear-resize [H, W, C] maps to (h, w) with torch
    F.interpolate(align_corners=False) semantics (cv2 INTER_LINEAR)."""
    import cv2

    out = cv2.resize(np.asarray(maps, np.float32), (w, h), interpolation=cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def resample_fine_and_coarse_segm_tensors_to_bbox(
    fine_segm: np.ndarray, coarse_segm: np.ndarray, box_xywh_abs
) -> np.ndarray:
    """[S, S, C] maps -> per-pixel labels [h, w] inside the box: argmax of
    the resized fine segmentation, gated by foreground of the resized coarse
    segmentation (reference segm_to_mask.py:34-64)."""
    x, y, w, h = box_xywh_abs
    w = max(int(w), 1)
    h = max(int(h), 1)
    coarse = _resize_chw(coarse_segm, h, w).argmax(axis=-1)
    labels = _resize_chw(fine_segm, h, w).argmax(axis=-1) * (coarse > 0)
    return labels.astype(np.int64)


def resample_uv_tensors_to_bbox(
    u: np.ndarray, v: np.ndarray, labels: np.ndarray, box_xywh_abs
) -> np.ndarray:
    """Select each pixel's U/V from its labeled part channel
    (reference chart_output_to_chart_result.py:20-47)."""
    x, y, w, h = box_xywh_abs
    w = max(int(w), 1)
    h = max(int(h), 1)
    u_bbox = _resize_chw(u, h, w)  # [h, w, C]
    v_bbox = _resize_chw(v, h, w)
    C = u_bbox.shape[-1]
    part = np.clip(labels, 0, C - 1)
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv = np.zeros((2, h, w), np.float32)
    fg = labels > 0
    uv[0][fg] = u_bbox[ii, jj, part][fg]
    uv[1][fg] = v_bbox[ii, jj, part][fg]
    return uv


def _select_confidence(conf_map: Optional[np.ndarray], h: int, w: int) -> Optional[np.ndarray]:
    if conf_map is None:
        return None
    resized = _resize_chw(conf_map, h, w)
    return resized[..., 0]


def densepose_chart_predictor_output_to_result(
    predictor_output: Dict[str, np.ndarray], box_xyxy_abs
) -> DensePoseChartResult:
    """One detection's chart maps + box -> DensePoseChartResult
    (reference chart_output_to_chart_result.py:76-103)."""
    box_xywh = make_int_box(
        BoxMode.convert(np.asarray(box_xyxy_abs, np.float64).reshape(1, 4), BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    )
    labels = resample_fine_and_coarse_segm_tensors_to_bbox(
        predictor_output["fine_segm"], predictor_output["coarse_segm"], box_xywh
    )
    uv = resample_uv_tensors_to_bbox(
        predictor_output["u"], predictor_output["v"], labels, box_xywh
    )
    return DensePoseChartResult(labels=labels, uv=uv)


def densepose_chart_predictor_output_to_result_with_confidences(
    predictor_output: Dict[str, np.ndarray], box_xyxy_abs
) -> DensePoseChartResultWithConfidences:
    """(reference chart_output_to_chart_result.py:146-188)."""
    box_xywh = make_int_box(
        BoxMode.convert(np.asarray(box_xyxy_abs, np.float64).reshape(1, 4), BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    )
    base = densepose_chart_predictor_output_to_result(predictor_output, box_xyxy_abs)
    h, w = base.labels.shape
    return DensePoseChartResultWithConfidences(
        labels=base.labels,
        uv=base.uv,
        sigma_1=_select_confidence(predictor_output.get("sigma_1"), h, w),
        sigma_2=_select_confidence(predictor_output.get("sigma_2"), h, w),
        kappa_u=_select_confidence(predictor_output.get("kappa_u"), h, w),
        kappa_v=_select_confidence(predictor_output.get("kappa_v"), h, w),
        fine_segm_confidence=_select_confidence(
            predictor_output.get("fine_segm_confidence"), h, w
        ),
        coarse_segm_confidence=_select_confidence(
            predictor_output.get("coarse_segm_confidence"), h, w
        ),
    )


def predictor_output_with_coarse_segm_to_mask(
    coarse_segm: np.ndarray, boxes: np.ndarray, image_size_hw: Tuple[int, int]
) -> BitMasks:
    """Paste per-detection coarse foreground into full-image BitMasks
    (reference segm_to_mask.py:87-128).

    Args:
        coarse_segm: [N, S, S, K] per-detection coarse segmentation maps.
        boxes: [N, 4] XYXY absolute boxes.
        image_size_hw: output (H, W).
    """
    H, W = image_size_hw
    N = coarse_segm.shape[0]
    masks = np.zeros((N, H, W), bool)
    for i in range(N):
        box_xywh = make_int_box(
            BoxMode.convert(np.asarray(boxes[i], np.float64).reshape(1, 4), BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        )
        x, y, w, h = box_xywh
        w = max(w, 1)
        h = max(h, 1)
        fg = _resize_chw(coarse_segm[i], h, w).argmax(axis=-1) > 0
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W), min(y + h, H)
        if x1 > x0 and y1 > y0:
            masks[i, y0:y1, x0:x1] = fg[y0 - y : y1 - y, x0 - x : x1 - x]
    return BitMasks(masks)


class ToChartResultConverter:
    """API-parity converter facade (reference converters/to_chart_result.py):
    ``ToChartResultConverter.convert(outputs, boxes)`` over one detection."""

    @staticmethod
    def convert(predictor_output: Dict[str, np.ndarray], boxes) -> DensePoseChartResult:
        box = boxes.tensor[0] if isinstance(boxes, Boxes) else np.asarray(boxes).reshape(-1)[:4]
        return densepose_chart_predictor_output_to_result(predictor_output, box)


class ToChartResultConverterWithConfidences:
    @staticmethod
    def convert(
        predictor_output: Dict[str, np.ndarray], boxes
    ) -> DensePoseChartResultWithConfidences:
        box = boxes.tensor[0] if isinstance(boxes, Boxes) else np.asarray(boxes).reshape(-1)[:4]
        return densepose_chart_predictor_output_to_result_with_confidences(predictor_output, box)


class ToMaskConverter:
    """(reference converters/to_mask.py)."""

    @staticmethod
    def convert(coarse_segm: np.ndarray, boxes, image_size_hw) -> BitMasks:
        b = boxes.tensor if isinstance(boxes, Boxes) else np.asarray(boxes)
        return predictor_output_with_coarse_segm_to_mask(coarse_segm, b, image_size_hw)


def densepose_chart_predictor_output_hflip(
    output: Dict[str, np.ndarray], transform_data
) -> Dict[str, np.ndarray]:
    """Flip one detection's chart maps for horizontal-flip TTA
    (reference converters/chart_output_hflip.py): mirror the W axis, remap
    U/V values through the UV symmetry tables, and permute the part
    channels (fine_segm/u/v by point label symmetry; coarse_segm by mask
    label symmetry when it has the 15-channel body-part layout).

    Maps are [H, W, C] (channel-last); confidence channels flip spatially
    only.
    """
    out = {k: np.asarray(v, np.float32)[:, ::-1].copy() for k, v in output.items()}

    pt_sym = transform_data.point_label_symmetries
    uv_sym = transform_data.uv_symmetries
    if uv_sym is not None and "u" in out:
        u = out["u"]
        v = out["v"]
        H, W, C = u.shape
        u_loc = (np.clip(u[..., 1:], 0, 1) * 255).astype(np.int64)
        v_loc = (np.clip(v[..., 1:], 0, 1) * 255).astype(np.int64)
        idx = np.arange(C - 1)[None, None, :]
        out["u"][..., 1:] = uv_sym["U_transforms"][idx, v_loc, u_loc]
        out["v"][..., 1:] = uv_sym["V_transforms"][idx, v_loc, u_loc]
    for k in ("fine_segm", "u", "v"):
        if k in out:
            out[k] = out[k][..., pt_sym]
    if "coarse_segm" in out and out["coarse_segm"].shape[-1] > 2:
        out["coarse_segm"] = out["coarse_segm"][..., transform_data.mask_label_symmetries]
    return out
