"""Rescale padded device outputs to original image resolution.

Parity with reference detectron2/modeling/postprocessing.py:9-100. Runs on the
host: the device step produces fixed-shape detections in the (resized, padded)
network frame; this converts one image's slice into a dynamic host
:class:`Instances` at the original (height, width), pasting 28x28 roi masks
with a vectorized separable resampling (the reference's GPU paste semantics,
layers/mask_ops.py:17-147). The compiled graph can also paste at the network
frame on device (TPU.PASTE_MASKS_IN_GRAPH); the original-resolution paste
stays here because original sizes are dynamic per image.
"""

from typing import Dict, Optional

import numpy as np

from detectron2_tpu.structures import Boxes, Instances

__all__ = ["detector_postprocess", "sem_seg_postprocess"]


def _interp_matrix_np(starts: np.ndarray, ends: np.ndarray, out_size: int, M: int) -> np.ndarray:
    """Per-instance bilinear sampling matrices [N, out_size, M] — the numpy
    twin of ops/paste_masks._interp_matrix (grid_sample align_corners=False +
    zero padding), so host and device pastes agree bit-for-bit."""
    N = starts.shape[0]
    i = np.arange(out_size, dtype=np.float32)[None, :]
    length = np.maximum(ends - starts, 1e-4)[:, None].astype(np.float32)
    p = (i + 0.5 - starts[:, None].astype(np.float32)) / length * M - 0.5
    m0 = np.floor(p)
    frac = p - m0
    m0i = m0.astype(np.int64)
    m1i = m0i + 1
    w0 = ((1.0 - frac) * ((m0i >= 0) & (m0i < M))).astype(np.float32)
    w1 = (frac * ((m1i >= 0) & (m1i < M))).astype(np.float32)
    W = np.zeros((N, out_size, M), np.float32)
    n_idx = np.arange(N)[:, None]
    r_idx = np.arange(out_size)[None, :]
    np.add.at(W, (n_idx, r_idx, np.clip(m0i, 0, M - 1)), w0)
    np.add.at(W, (n_idx, r_idx, np.clip(m1i, 0, M - 1)), w1)
    return W


def _paste_masks_np(
    masks: np.ndarray, boxes: np.ndarray, height: int, width: int, threshold: float = 0.5
) -> np.ndarray:
    """Paste [N, M, M] mask probabilities into [N, height, width] bool masks.

    Vectorized separable formulation (out = Wy @ mask @ Wx^T per instance) —
    the reference's GPU `_do_paste_mask` semantics (mask_ops.py:17-69), not
    the integer-cropped CPU `paste_mask_in_image_old` variant.
    """
    N, M, _ = masks.shape
    if N == 0:
        return np.zeros((0, height, width), dtype=bool)
    wy = _interp_matrix_np(boxes[:, 1], boxes[:, 3], height, M)  # [N, H, M]
    wx = _interp_matrix_np(boxes[:, 0], boxes[:, 2], width, M)  # [N, W, M]
    tmp = np.einsum("nhm,nmk->nhk", wy, masks.astype(np.float32))
    probs = np.einsum("nhk,nwk->nhw", tmp, wx)
    return probs >= threshold


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

    # drop empty boxes after clipping (reference postprocessing.py:39-42:
    # results = results[output_boxes.nonempty()])
    nonempty = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    boxes, scores, classes = boxes[nonempty], scores[nonempty], classes[nonempty]
    valid_idx = np.where(valid)[0][nonempty]
    valid = np.zeros_like(np.asarray(results["valid"], bool))
    valid[valid_idx] = True

    out = Instances((output_height, output_width))
    out.pred_boxes = Boxes(boxes.astype(np.float32))
    out.scores = scores
    out.pred_classes = classes

    if "pred_masks" in results:
        roi_masks = np.asarray(results["pred_masks"], np.float32)[valid]
        masks = _paste_masks_np(roi_masks, boxes, output_height, output_width, mask_threshold)
        from detectron2_tpu.structures import BitMasks

        out.pred_masks = BitMasks(masks)

    if "pred_keypoints" in results:
        kpts = np.asarray(results["pred_keypoints"], np.float32)[valid]
        if len(kpts):
            kpts[..., 0] *= scale_x
            kpts[..., 1] *= scale_y
        from detectron2_tpu.structures import Keypoints

        # (x, y, logit, prob) -> keep (x, y, prob), matching the reference's
        # keypoint_results[:, :, [0, 1, 3]] (keypoint_head.py:123)
        if kpts.ndim == 3 and kpts.shape[-1] == 4:
            kpts = kpts[..., [0, 1, 3]]
        out.pred_keypoints = kpts

    # DensePose project outputs ride along as per-detection list fields (the
    # reference slices them generically through Instances indexing,
    # postprocessing.py:23; our padded dicts name them explicitly). The maps
    # are box-relative, so no rescaling is needed.
    valid_idx = np.where(valid)[0]
    if "pred_densepose" in results:  # chart IUV stacks [D, M, M, 3]
        dp = np.asarray(results["pred_densepose"], np.float32)
        out.pred_densepose = [dp[i] for i in valid_idx]
    elif "pred_densepose_embedding" in results:  # CSE: embedding + fg mask
        emb = np.asarray(results["pred_densepose_embedding"], np.float32)
        fg = np.asarray(results["pred_densepose_fg"], bool)
        out.pred_densepose = [{"embedding": emb[i], "fg": fg[i]} for i in valid_idx]
    if "pred_densepose_raw" in results:  # raw chart maps (RAW_OUTPUTS)
        raw = {k: np.asarray(v) for k, v in results["pred_densepose_raw"].items()}
        out.pred_densepose_raw = [{k: v[i] for k, v in raw.items()} for i in valid_idx]

    return out


def sem_seg_postprocess(result: np.ndarray, img_size, output_height: int, output_width: int) -> np.ndarray:
    """Resize semantic segmentation logits [H, W, C] (network frame, possibly
    padded) to the original resolution (reference postprocessing.py:77)."""
    import cv2

    result = np.asarray(result, np.float32)
    h, w = img_size
    result = result[:h, :w]
    return cv2.resize(result, (output_width, output_height), interpolation=cv2.INTER_LINEAR)
