"""DenseDetector base: shared machinery for one-stage detectors.

Parity with reference detectron2/modeling/meta_arch/dense_detector.py:27-294,
fixed-shape: per-level head outputs are reshaped to [B, HWA, K]; decoding
takes a per-level top-k then NMSes the union (the reference's
_decode_multi_level_predictions protocol).
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.modeling.backbone import Backbone
from detectron2_tpu.ops.nms import batched_nms_padded
from detectron2_tpu.ops.topk import top_k_padded

__all__ = ["DenseDetector", "permute_to_N_HWA_K", "decode_dense_predictions_padded"]


def permute_to_N_HWA_K(tensor: jnp.ndarray, K: int) -> jnp.ndarray:
    """[B, H, W, A*K] (NHWC head output) -> [B, H*W*A, K]."""
    B = tensor.shape[0]
    return tensor.reshape(B, -1, K)


def decode_dense_predictions_padded(
    box2box_transform,
    anchors: List[jnp.ndarray],  # per level [HWA, 4]
    pred_logits: List[jnp.ndarray],  # per level [B, HWA, C] (class scores, post-sigmoid)
    pred_deltas: List[jnp.ndarray],  # per level [B, HWA, 4]
    image_sizes: jnp.ndarray,  # [B, 2]
    score_thresh: float,
    topk_candidates: int,
    nms_thresh: float,
    max_detections: int,
    topk_recall_target: float = 0.99,
    exact_topk: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The one-stage inference decode (reference dense_detector.py
    _decode_per_level_predictions + retinanet inference_single_image), padded:

    per level: flatten scores [B, HWA*C] -> top-k -> decode the selected
    anchors' boxes; union of levels -> class-batched NMS -> top
    max_detections slots.
    """
    B = pred_logits[0].shape[0]
    C = pred_logits[0].shape[-1]

    all_scores, all_boxes, all_classes = [], [], []
    for anchors_l, logits_l, deltas_l in zip(anchors, pred_logits, pred_deltas):
        HWA = anchors_l.shape[0]
        flat = logits_l.reshape(B, HWA * C)
        k = min(topk_candidates, HWA * C)
        # [B, HWA*C] is up to 12M entries/level: TPU takes the approx_max_k
        # partial reduction (exact lax.top_k full-sorted this at ~600 ms per
        # RetinaNet batch); CPU stays exact (see ops/topk.py)
        top_scores, top_idx = top_k_padded(
            flat, k, recall_target=topk_recall_target, exact=exact_topk or None
        )  # [B, k]
        anchor_idx = top_idx // C
        cls_idx = top_idx % C

        sel_deltas = jnp.take_along_axis(deltas_l, anchor_idx[..., None], axis=1)  # [B,k,4]
        sel_anchors = anchors_l[anchor_idx]  # [B,k,4]
        boxes = box2box_transform.apply_deltas(
            sel_deltas.reshape(-1, 4), sel_anchors.reshape(-1, 4)
        ).reshape(B, k, 4)

        valid = top_scores > score_thresh
        all_scores.append(jnp.where(valid, top_scores, -jnp.inf))
        all_boxes.append(boxes)
        all_classes.append(cls_idx)

    scores = jnp.concatenate(all_scores, axis=1)  # [B, K]
    boxes = jnp.concatenate(all_boxes, axis=1)
    classes = jnp.concatenate(all_classes, axis=1)

    def per_image(s, b, c, hw):
        # NO box clipping here: the reference's dense decode
        # (dense_detector.py:206-238) runs NMS on the raw decoded boxes and
        # clips only in detector_postprocess; clipping first would change
        # NMS IoU for boxes extending past the image edge.
        del hw
        valid = jnp.isfinite(s)
        keep = batched_nms_padded(b, s, c, nms_thresh, valid=valid)
        final = jnp.where(keep, s, -jnp.inf)
        D = min(max_detections, final.shape[0])
        out_s, idx = jax.lax.top_k(final, D)
        out_valid = jnp.isfinite(out_s)
        out = (
            b[idx],
            jnp.where(out_valid, out_s, 0.0),
            c[idx],
            out_valid,
        )
        if D < max_detections:
            pad = max_detections - D
            out = (
                jnp.pad(out[0], ((0, pad), (0, 0))),
                jnp.pad(out[1], (0, pad)),
                jnp.pad(out[2], (0, pad)),
                jnp.pad(out[3], (0, pad)),
            )
        return out

    pb, ps, pc, pv = jax.vmap(per_image)(scores, boxes, classes, image_sizes)
    return {"pred_boxes": pb, "scores": ps, "pred_classes": pc, "valid": pv}


class DenseDetector(nn.Module):
    """Base class for one-stage detectors: backbone + multi-level head
    (reference dense_detector.py:27). Subclasses implement
    forward_training/forward_inference over the reshaped predictions."""

    backbone: Backbone
    head: nn.Module
    head_in_features: Tuple[str, ...]
    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    compute_dtype: str = "bfloat16"

    def preprocess_image(self, image: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = (image.astype(jnp.float32) - mean) / std
        return x.astype(jnp.dtype(self.compute_dtype))

    def _ema_loss_normalizer(self, current: jnp.ndarray, momentum: float = 0.9):
        """EMA of #foreground anchors used to normalize the focal loss
        (reference dense_detector.py:183). Stored in a mutable 'meters'
        collection so it persists across compiled steps; stop_gradient so the
        normalizer never backpropagates."""
        init = jnp.asarray(100.0, jnp.float32)
        meter = self.variable("meters", "loss_normalizer", lambda: init)
        new_val = meter.value * momentum + current * (1 - momentum)
        if not self.is_initializing() and self.scope.is_mutable_collection("meters"):
            meter.value = new_val
        return jax.lax.stop_gradient(new_val)
