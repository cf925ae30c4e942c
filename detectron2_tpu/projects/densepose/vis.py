"""DensePose result visualization
(reference projects/DensePose/densepose/vis/{base,densepose_results,
extractor}.py), cv2 host-side.

The chart results are drawn as colormapped overlays inside each detection
box: fine-segmentation labels, U, or V. ``DensePoseResultExtractor`` bridges
the framework's padded per-detection outputs (or host Instances carrying
``pred_densepose``) to the visualizers.
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from detectron2_tpu.projects.densepose.converters import (
    densepose_chart_predictor_output_to_result_with_confidences,
)
from detectron2_tpu.projects.densepose.structures import DensePoseChartResult
from detectron2_tpu.structures import Boxes, BoxMode, Instances

__all__ = [
    "MatrixVisualizer",
    "DensePoseResultsVisualizer",
    "DensePoseMaskedColormapResultsVisualizer",
    "DensePoseResultsFineSegmentationVisualizer",
    "DensePoseResultsUVisualizer",
    "DensePoseResultsVVisualizer",
    "DensePoseResultExtractor",
    "extract_boxes_xywh_from_instances",
]


class MatrixVisualizer:
    """Colormapped-matrix overlay inside a bbox (reference vis/base.py:13-75)."""

    def __init__(
        self,
        inplace=True,
        cmap=None,
        val_scale=1.0,
        alpha=0.7,
    ):
        import cv2

        self.inplace = inplace
        self.cmap = cv2.COLORMAP_PARULA if cmap is None else cmap
        self.val_scale = val_scale
        self.alpha = alpha

    def visualize(self, image_bgr, mask, matrix, bbox_xywh):
        import cv2

        image_target_bgr = image_bgr if self.inplace else image_bgr * 0
        x, y, w, h = [int(v) for v in bbox_xywh]
        if w <= 0 or h <= 0:
            return image_bgr
        mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
        matrix = cv2.resize(matrix, (w, h), interpolation=cv2.INTER_LINEAR)
        mask_bg = np.tile((mask == 0)[:, :, None], [1, 1, 3])
        matrix_scaled_8u = (matrix.astype(np.float32) * self.val_scale).clip(0, 255).astype(np.uint8)
        matrix_vis = cv2.applyColorMap(matrix_scaled_8u, self.cmap)
        matrix_vis[mask_bg] = image_target_bgr[y : y + h, x : x + w, :][mask_bg]
        image_target_bgr[y : y + h, x : x + w, :] = (
            image_target_bgr[y : y + h, x : x + w, :] * (1.0 - self.alpha)
            + matrix_vis * self.alpha
        )
        return image_target_bgr.astype(np.uint8)


class DensePoseResultsVisualizer:
    """(reference vis/densepose_results.py:16-46)."""

    def visualize(self, image_bgr, results_and_boxes_xywh):
        densepose_result, boxes_xywh = results_and_boxes_xywh
        if densepose_result is None or boxes_xywh is None:
            return image_bgr
        boxes_xywh = np.asarray(boxes_xywh)
        context = self.create_visualization_context(image_bgr)
        for i, result in enumerate(densepose_result):
            iuv_array = np.concatenate(
                [result.labels[None].astype(np.float32), result.uv * 255.0]
            ).astype(np.uint8)
            self.visualize_iuv_arr(context, iuv_array, boxes_xywh[i])
        return self.context_to_image_bgr(context)

    def create_visualization_context(self, image_bgr):
        return image_bgr

    def visualize_iuv_arr(self, context, iuv_arr, bbox_xywh):
        pass

    def context_to_image_bgr(self, context):
        return context


class DensePoseMaskedColormapResultsVisualizer(DensePoseResultsVisualizer):
    """(reference vis/densepose_results.py:49-76)."""

    def __init__(self, data_extractor, segm_extractor, inplace=True, cmap=None,
                 alpha=0.7, val_scale=1.0):
        self.mask_visualizer = MatrixVisualizer(
            inplace=inplace, cmap=cmap, val_scale=val_scale, alpha=alpha
        )
        self.data_extractor = data_extractor
        self.segm_extractor = segm_extractor

    def visualize_iuv_arr(self, context, iuv_arr, bbox_xywh):
        matrix = self.data_extractor(iuv_arr)
        segm = self.segm_extractor(iuv_arr)
        mask = (segm > 0).astype(np.uint8)
        self.mask_visualizer.visualize(context, mask, matrix, bbox_xywh)


def _extract_i_from_iuvarr(iuv_arr):
    return iuv_arr[0, :, :]


def _extract_u_from_iuvarr(iuv_arr):
    return iuv_arr[1, :, :]


def _extract_v_from_iuvarr(iuv_arr):
    return iuv_arr[2, :, :]


class DensePoseResultsFineSegmentationVisualizer(DensePoseMaskedColormapResultsVisualizer):
    """Part labels, scaled to the colormap range
    (reference densepose_results.py:310-320)."""

    def __init__(self, inplace=True, cmap=None, alpha=0.7, **kwargs):
        from detectron2_tpu.projects.densepose.structures import DensePoseDataRelative

        super().__init__(
            _extract_i_from_iuvarr,
            _extract_i_from_iuvarr,
            inplace=inplace,
            cmap=cmap,
            alpha=alpha,
            val_scale=255.0 / DensePoseDataRelative.N_PART_LABELS,
        )


class DensePoseResultsUVisualizer(DensePoseMaskedColormapResultsVisualizer):
    """(reference densepose_results.py:323-331)."""

    def __init__(self, inplace=True, cmap=None, alpha=0.7, **kwargs):
        super().__init__(
            _extract_u_from_iuvarr, _extract_i_from_iuvarr,
            inplace=inplace, cmap=cmap, alpha=alpha, val_scale=1.0,
        )


class DensePoseResultsVVisualizer(DensePoseMaskedColormapResultsVisualizer):
    """(reference densepose_results.py:334-342)."""

    def __init__(self, inplace=True, cmap=None, alpha=0.7, **kwargs):
        super().__init__(
            _extract_v_from_iuvarr, _extract_i_from_iuvarr,
            inplace=inplace, cmap=cmap, alpha=alpha, val_scale=1.0,
        )


def extract_boxes_xywh_from_instances(instances: Instances) -> Optional[np.ndarray]:
    """(reference vis/extractor.py:56-62)."""
    if instances.has("pred_boxes"):
        boxes = np.asarray(instances.pred_boxes.tensor, np.float64)
        return BoxMode.convert(boxes, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    return None


class DensePoseResultExtractor:
    """Instances (with per-detection chart maps) -> (results, boxes_xywh)
    (reference vis/extractor.py:88-107).

    ``pred_densepose`` may be a list of per-detection dicts of [S, S, C]
    maps (the framework's padded device outputs, sliced per detection) with
    keys coarse_segm / fine_segm / u / v (+ optional confidence channels).
    """

    def __call__(self, instances: Instances, select=None):
        if not (instances.has("pred_densepose") and instances.has("pred_boxes")):
            return None, None
        dpout = instances.pred_densepose
        boxes_xyxy = np.asarray(instances.pred_boxes.tensor, np.float64)
        boxes_xywh = extract_boxes_xywh_from_instances(instances)
        if select is not None:
            dpout = [dpout[i] for i in np.nonzero(select)[0]]
            boxes_xyxy = boxes_xyxy[select]
            boxes_xywh = boxes_xywh[select]
        results = [
            self._one_result(dpout[i], boxes_xyxy[i], boxes_xywh[i])
            for i in range(len(dpout))
        ]
        return results, boxes_xywh

    @staticmethod
    def _one_result(dp, box_xyxy, box_xywh):
        if isinstance(dp, dict):
            # raw predictor maps {coarse_segm, fine_segm, u, v, ...}
            return densepose_chart_predictor_output_to_result_with_confidences(dp, box_xyxy)
        # the compiled model's [M, M, 3] IUV stack (part, u, v) — resize to
        # box size: nearest for labels, bilinear for uv
        import cv2

        dp = np.asarray(dp, np.float32)
        w = max(int(box_xywh[2]), 1)
        h = max(int(box_xywh[3]), 1)
        labels = cv2.resize(dp[..., 0], (w, h), interpolation=cv2.INTER_NEAREST).astype(np.int64)
        uv = np.stack(
            [
                cv2.resize(dp[..., 1], (w, h), interpolation=cv2.INTER_LINEAR),
                cv2.resize(dp[..., 2], (w, h), interpolation=cv2.INTER_LINEAR),
            ]
        )
        from detectron2_tpu.projects.densepose.structures import (
            DensePoseChartResultWithConfidences,
        )

        return DensePoseChartResultWithConfidences(labels=labels, uv=uv)
