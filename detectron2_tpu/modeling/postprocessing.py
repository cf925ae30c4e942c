"""Rescale padded device outputs to original image resolution.

Parity with reference detectron2/modeling/postprocessing.py:9-100. Runs on the
host: the device step produces fixed-shape detections in the (resized, padded)
network frame; this converts one image's slice into a dynamic host
:class:`Instances` at the original (height, width), pasting 28x28 roi masks
with cv2 (the same per-box paste as the reference's CPU path,
layers/mask_ops.py:155 paste_mask_in_image_old).
"""

from typing import Dict, Optional

import numpy as np

from detectron2_tpu.structures import Boxes, Instances

__all__ = ["detector_postprocess", "sem_seg_postprocess"]


def _paste_mask_np(mask: np.ndarray, box: np.ndarray, height: int, width: int, threshold: float = 0.5) -> np.ndarray:
    """Paste one M x M mask probability map into an image-sized bool mask."""
    import cv2

    x0, y0, x1, y1 = box
    ix0 = max(int(np.floor(x0)), 0)
    iy0 = max(int(np.floor(y0)), 0)
    ix1 = min(int(np.ceil(x1)), width)
    iy1 = min(int(np.ceil(y1)), height)
    out = np.zeros((height, width), dtype=bool)
    if ix1 <= ix0 or iy1 <= iy0:
        return out
    M = mask.shape[0]
    # sample the mask at the centers of the integer pixels inside the box,
    # using the same align_corners=False mapping as the device paste
    ys = (np.arange(iy0, iy1) + 0.5 - y0) / max(y1 - y0, 1e-4) * M - 0.5
    xs = (np.arange(ix0, ix1) + 0.5 - x0) / max(x1 - x0, 1e-4) * M - 0.5
    map_x, map_y = np.meshgrid(xs.astype(np.float32), ys.astype(np.float32))
    patch = cv2.remap(
        mask.astype(np.float32), map_x, map_y, interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
    )
    out[iy0:iy1, ix0:ix1] = patch >= threshold
    return out


def detector_postprocess(
    results: Dict[str, np.ndarray],
    output_height: int,
    output_width: int,
    input_height: int,
    input_width: int,
    mask_threshold: float = 0.5,
) -> Instances:
    """
    Args:
        results: ONE image's slice of the padded detections dict (numpy):
            pred_boxes [D,4], scores [D], pred_classes [D], valid [D],
            optional pred_masks [D,M,M], pred_keypoints [D,K,4]. Boxes are in
            the network input frame of size (input_height, input_width).
        output_height/width: original image size to rescale into.

    Returns:
        host Instances with padding dropped and boxes/masks/keypoints in the
        original frame.
    """
    valid = np.asarray(results["valid"]).astype(bool)
    boxes = np.asarray(results["pred_boxes"], np.float64)[valid]
    scores = np.asarray(results["scores"], np.float32)[valid]
    classes = np.asarray(results["pred_classes"], np.int64)[valid]

    scale_x = output_width / input_width
    scale_y = output_height / input_height
    boxes = boxes * np.array([scale_x, scale_y, scale_x, scale_y])
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, output_width)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, output_height)

    out = Instances((output_height, output_width))
    out.pred_boxes = Boxes(boxes.astype(np.float32))
    out.scores = scores
    out.pred_classes = classes

    if "pred_masks" in results:
        roi_masks = np.asarray(results["pred_masks"], np.float32)[valid]
        masks = np.stack(
            [
                _paste_mask_np(m, b, output_height, output_width, mask_threshold)
                for m, b in zip(roi_masks, boxes)
            ]
        ) if len(roi_masks) else np.zeros((0, output_height, output_width), bool)
        from detectron2_tpu.structures import BitMasks

        out.pred_masks = BitMasks(masks)

    if "pred_keypoints" in results:
        kpts = np.asarray(results["pred_keypoints"], np.float32)[valid]
        if len(kpts):
            kpts[..., 0] *= scale_x
            kpts[..., 1] *= scale_y
        from detectron2_tpu.structures import Keypoints

        # (x, y, logit, prob) -> keep (x, y, prob) for the standard 3-tuple
        out.pred_keypoints = kpts

    return out


def sem_seg_postprocess(result: np.ndarray, img_size, output_height: int, output_width: int) -> np.ndarray:
    """Resize semantic segmentation logits [H, W, C] (network frame, possibly
    padded) to the original resolution (reference postprocessing.py:77)."""
    import cv2

    result = np.asarray(result, np.float32)
    h, w = img_size
    result = result[:h, :w]
    return cv2.resize(result, (output_width, output_height), interpolation=cv2.INTER_LINEAR)
