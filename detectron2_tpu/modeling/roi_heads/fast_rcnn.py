"""Fast R-CNN output layers: classification + box regression + padded inference.

Parity with reference detectron2/modeling/roi_heads/fast_rcnn.py
(FastRCNNOutputLayers :174-569, fast_rcnn_inference :46-171), fixed-shape:

- losses consume padded sampled proposals ([R] slots with gt_class = -1 on
  padding) and reduce with masks.
- inference: score-threshold masking -> static top-K candidate pool ->
  class-batched greedy NMS (ops.nms) -> top ``topk_per_image`` slots. The
  reference NMSes every candidate above threshold (dynamic count); the static
  candidate pool (default 2048 per image) only drops candidates that could
  never enter the final 100.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import cross_entropy, sigmoid_focal_loss, smooth_l1_loss, giou_loss, diou_loss, ciou_loss, binary_cross_entropy_with_logits
from detectron2_tpu.modeling.box_regression import Box2BoxTransform
from detectron2_tpu.ops.nms import batched_nms_padded

__all__ = ["FastRCNNOutputLayers", "fast_rcnn_inference_padded", "fed_loss_class_mask"]


def fed_loss_class_mask(
    rng: jax.Array,
    gt_classes: jnp.ndarray,  # [R] in [0, C] (C = background); -1 = padding
    valid: jnp.ndarray,  # [R]
    num_classes: int,
    num_fed_loss_classes: int,
    weights: jnp.ndarray,  # [C] sampling weight per foreground class
) -> jnp.ndarray:
    """[C] bool mask of classes contributing to the federated sigmoid CE.

    Fixed-shape reformulation of the reference's get_fed_loss_classes
    (fast_rcnn.py:356-381): classes appearing among the minibatch's proposals
    are always kept, and negatives are drawn weighted-without-replacement to
    reach ``num_fed_loss_classes`` total. The reference's
    torch.multinomial(replacement=False) becomes Gumbel top-k over the
    per-class ranks, which samples the identical distribution without a
    data-dependent sample count.
    """
    C = num_classes
    # appeared classes, background (C) included in the count like the
    # reference's torch.unique; padding slots (-1) scatter to a C+1 dummy row
    idx = jnp.where(valid, gt_classes, C + 1).astype(jnp.int32)
    appeared = jnp.zeros((C + 2,), bool).at[idx].set(True)[: C + 1]
    n_appeared = appeared.sum()

    # weighted sampling without replacement over non-appeared fg classes
    prob = jnp.where(appeared[:C], 0.0, weights.astype(jnp.float32))
    gumbel = jax.random.gumbel(rng, (C,), jnp.float32)
    scores = jnp.where(prob > 0, jnp.log(jnp.maximum(prob, 1e-30)) + gumbel, -jnp.inf)
    rank = jnp.argsort(jnp.argsort(-scores))  # rank 0 = best
    n_neg = jnp.maximum(num_fed_loss_classes - n_appeared, 0)
    sampled = (rank < n_neg) & (prob > 0)
    return appeared[:C] | sampled


def fast_rcnn_inference_padded(
    boxes: jnp.ndarray,  # [B, P, K, 4] per-class decoded boxes (K = num_classes or 1)
    scores: jnp.ndarray,  # [B, P, C+1] softmax probabilities (incl. background last)
    proposal_valid: jnp.ndarray,  # [B, P]
    image_sizes: jnp.ndarray,  # [B, 2]
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    candidate_topk: int = 2048,
) -> Dict[str, jnp.ndarray]:
    """Per-image class-wise filtering + NMS, all padded.

    Returns dict with pred_boxes [B,D,4], scores [B,D], pred_classes [B,D],
    valid [B,D], and the index of the source proposal box_idx [B,D] (used to
    run mask/keypoint heads on the final detections).
    """
    B, P, Cp1 = scores.shape
    C = Cp1 - 1
    K = boxes.shape[2]

    def per_image(boxes_i, scores_i, valid_i, hw):
        # drop background column
        s = scores_i[:, :C]  # [P, C]
        # clip boxes to image
        h = hw[0].astype(boxes_i.dtype)
        w = hw[1].astype(boxes_i.dtype)
        b = jnp.stack(
            [
                jnp.clip(boxes_i[..., 0], 0, w),
                jnp.clip(boxes_i[..., 1], 0, h),
                jnp.clip(boxes_i[..., 2], 0, w),
                jnp.clip(boxes_i[..., 3], 0, h),
            ],
            axis=-1,
        )  # [P, K, 4]
        if K == 1:
            b = jnp.broadcast_to(b, (P, C, 4))
        finite = jnp.all(jnp.isfinite(b), axis=-1)  # [P, C]
        keep = (s > score_thresh) & valid_i[:, None] & finite & jnp.isfinite(s)

        flat_scores = jnp.where(keep, s, -jnp.inf).reshape(-1)  # [P*C]
        cand = min(candidate_topk, flat_scores.shape[0])
        top_s, top_idx = jax.lax.top_k(flat_scores, cand)
        prop_idx = top_idx // C
        cls_idx = top_idx % C
        cand_boxes = b.reshape(-1, 4)[top_idx]
        cand_valid = jnp.isfinite(top_s)

        nms_keep = batched_nms_padded(
            cand_boxes, top_s, cls_idx, nms_thresh, valid=cand_valid
        )
        final_scores = jnp.where(nms_keep, top_s, -jnp.inf)
        D = min(topk_per_image, cand)
        out_s, out_i = jax.lax.top_k(final_scores, D)
        out_valid = jnp.isfinite(out_s)
        out_boxes = cand_boxes[out_i]
        out_cls = cls_idx[out_i]
        out_prop = prop_idx[out_i]
        if D < topk_per_image:
            pad = topk_per_image - D
            out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
            out_s = jnp.pad(out_s, (0, pad), constant_values=-jnp.inf)
            out_cls = jnp.pad(out_cls, (0, pad))
            out_prop = jnp.pad(out_prop, (0, pad))
            out_valid = jnp.pad(out_valid, (0, pad))
        return out_boxes, jnp.where(out_valid, out_s, 0.0), out_cls, out_prop, out_valid

    pb, ps, pc, pi, pv = jax.vmap(per_image)(boxes, scores, proposal_valid, image_sizes)
    return {
        "pred_boxes": pb,
        "scores": ps,
        "pred_classes": pc,
        "box_idx": pi,
        "valid": pv,
    }


class FastRCNNOutputLayers(nn.Module):
    """Two linear layers: (1) proposal-to-detection box regression deltas,
    (2) classification scores (reference fast_rcnn.py:174)."""

    num_classes: int
    box2box_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    cls_agnostic_bbox_reg: bool = False
    smooth_l1_beta: float = 0.0
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    test_topk_per_image: int = 100
    box_reg_loss_type: str = "smooth_l1"
    loss_weight_cls: float = 1.0
    loss_weight_box: float = 1.0
    use_sigmoid_ce: bool = False
    # federated loss (reference fast_rcnn.py:356-422, the LVIS recipe): only
    # classes appearing in the minibatch plus `fed_loss_num_classes` sampled
    # negatives contribute to the sigmoid CE
    use_fed_loss: bool = False
    fed_loss_num_classes: int = 50
    fed_loss_cls_weights: Optional[Tuple[float, ...]] = None
    box_dim: int = 4

    @classmethod
    def from_config(cls, cfg):
        use_fed_loss = cfg.MODEL.ROI_BOX_HEAD.USE_FED_LOSS
        fed_weights = None
        if use_fed_loss:
            from detectron2_tpu.data.detection_utils import get_fed_loss_cls_weights

            fed_weights = tuple(
                float(w)
                for w in get_fed_loss_cls_weights(
                    cfg.DATASETS.TRAIN, cfg.MODEL.ROI_BOX_HEAD.FED_LOSS_FREQ_WEIGHT_POWER
                )
            )
        return cls(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            box2box_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            test_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            test_nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            test_topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            loss_weight_box=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT,
            use_sigmoid_ce=cfg.MODEL.ROI_BOX_HEAD.USE_SIGMOID_CE,
            use_fed_loss=use_fed_loss,
            fed_loss_num_classes=cfg.MODEL.ROI_BOX_HEAD.FED_LOSS_NUM_CLASSES,
            fed_loss_cls_weights=fed_weights,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [R, D] box features -> (scores [R, C+1], deltas [R, kx4])."""
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        scores = nn.Dense(
            self.num_classes + 1,
            name="cls_score",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        num_bbox_reg_classes = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_bbox_reg_classes * self.box_dim,
            name="bbox_pred",
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)

    # ------------------------------------------------------------- training
    def losses(
        self,
        predictions: Tuple[jnp.ndarray, jnp.ndarray],
        proposal_boxes: jnp.ndarray,  # [R, 4]
        gt_boxes: jnp.ndarray,  # [R, 4] matched gt box per proposal
        gt_classes: jnp.ndarray,  # [R] in [0, C] (C = background), -1 = padding
    ) -> Dict[str, jnp.ndarray]:
        """Mask-reduced version of reference fast_rcnn.py:307-463:
        CE averaged over valid slots; box loss on fg slots / total valid."""
        scores, deltas = predictions
        R = scores.shape[0]
        valid = gt_classes >= 0
        fg = valid & (gt_classes < self.num_classes)
        num_valid = jnp.maximum(valid.sum(), 1)

        if self.use_sigmoid_ce:
            onehot = jax.nn.one_hot(
                jnp.where(valid, gt_classes, self.num_classes), self.num_classes + 1
            )[:, :-1]
            ce = binary_cross_entropy_with_logits(scores[:, :-1], onehot)  # [R, C]
            if self.use_fed_loss:
                assert self.fed_loss_cls_weights is not None, (
                    "use_fed_loss requires fed_loss_cls_weights"
                )
                cls_mask = fed_loss_class_mask(
                    self.make_rng("sampling"),
                    gt_classes,
                    valid,
                    self.num_classes,
                    self.fed_loss_num_classes,
                    jnp.asarray(self.fed_loss_cls_weights, jnp.float32),
                )
                ce = ce * cls_mask[None, :]
            loss_cls = (ce.sum(-1) * valid).sum() / num_valid
        else:
            loss_cls = cross_entropy(scores, jnp.where(valid, gt_classes, -100), reduction="sum", ignore_index=-100) / num_valid

        # select the fg class's delta slice
        k = deltas.shape[1] // self.box_dim
        deltas_k = deltas.reshape(R, k, self.box_dim)
        cls_for_reg = jnp.where(fg, gt_classes, 0)
        if k == 1:
            sel = deltas_k[:, 0]
        else:
            sel = jnp.take_along_axis(deltas_k, cls_for_reg[:, None, None].astype(jnp.int32), axis=1)[:, 0]

        transform = Box2BoxTransform(weights=self.box2box_weights)
        if self.box_reg_loss_type == "smooth_l1":
            gt_deltas = transform.get_deltas(proposal_boxes, gt_boxes)
            reg = smooth_l1_loss(sel, jax.lax.stop_gradient(gt_deltas), beta=self.smooth_l1_beta).sum(-1)
        elif self.box_reg_loss_type == "giou":
            pred = transform.apply_deltas(sel, proposal_boxes)
            reg = giou_loss(pred, gt_boxes)
        elif self.box_reg_loss_type == "diou":
            pred = transform.apply_deltas(sel, proposal_boxes)
            reg = diou_loss(pred, gt_boxes)
        elif self.box_reg_loss_type == "ciou":
            pred = transform.apply_deltas(sel, proposal_boxes)
            reg = ciou_loss(pred, gt_boxes)
        else:
            raise ValueError(f"Invalid bbox reg loss type '{self.box_reg_loss_type}'")
        loss_box = (reg * fg).sum() / num_valid

        return {
            "loss_cls": loss_cls * self.loss_weight_cls,
            "loss_box_reg": loss_box * self.loss_weight_box,
        }

    # ------------------------------------------------------------ inference
    def predict_boxes(self, predictions, proposal_boxes: jnp.ndarray) -> jnp.ndarray:
        """[B*P or P, k*4] decoded boxes -> reshaped [..., k, 4]
        (reference fast_rcnn.py:523)."""
        _, deltas = predictions
        transform = Box2BoxTransform(weights=self.box2box_weights)
        R = deltas.shape[0]
        out = transform.apply_deltas(deltas, proposal_boxes)
        return out.reshape(R, -1, self.box_dim)

    def predict_probs(self, predictions) -> jnp.ndarray:
        scores, _ = predictions
        if self.use_sigmoid_ce:
            return jax.nn.sigmoid(scores)
        return jax.nn.softmax(scores, axis=-1)

    def inference(
        self,
        predictions,
        proposal_boxes: jnp.ndarray,  # [B, P, 4]
        proposal_valid: jnp.ndarray,  # [B, P]
        image_sizes: jnp.ndarray,  # [B, 2]
    ) -> Dict[str, jnp.ndarray]:
        scores, deltas = predictions
        B, P = proposal_boxes.shape[:2]
        boxes = self.predict_boxes((scores, deltas), proposal_boxes.reshape(-1, 4)).reshape(
            B, P, -1, self.box_dim
        )
        probs = self.predict_probs((scores, deltas)).reshape(B, P, -1)
        return fast_rcnn_inference_padded(
            boxes,
            probs,
            proposal_valid,
            image_sizes,
            self.test_score_thresh,
            self.test_nms_thresh,
            self.test_topk_per_image,
        )
