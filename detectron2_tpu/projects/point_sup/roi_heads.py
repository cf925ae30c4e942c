"""ROI heads with a point-supervised mask loss
(reference projects/PointSup/point_sup/mask_head.py +
roi_heads implied wiring).

The mask head itself is the standard MaskRCNNConvUpsampleHead; only the loss
changes: instead of dense 28x28 BCE against a rasterized gt mask, the
predicted mask is bilinearly sampled at the matched gt's annotated points and
BCE is applied there (weighted by point validity).
"""

import jax
import jax.numpy as jnp

from detectron2_tpu.layers.losses import binary_cross_entropy_with_logits
from detectron2_tpu.modeling.roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    StandardROIHeads,
    select_foreground_slots,
)
from detectron2_tpu.projects.point_rend.point_features import (
    point_sample,
    point_sample_fine_grained_features,
)
from detectron2_tpu.projects.point_rend.roi_heads import ImplicitPointRendROIHeads
from detectron2_tpu.projects.point_sup.point_utils import (
    get_point_coords_from_point_annotation,
)

__all__ = ["PointSupROIHeads"]


@ROI_HEADS_REGISTRY.register()
class PointSupROIHeads(StandardROIHeads):
    """StandardROIHeads whose mask branch trains from point annotations."""

    def _forward_mask_train(self, feats, sampled, targets):
        assert "gt_point_coords" in targets, (
            "PointSupROIHeads needs gt_point_coords/gt_point_labels in the batch"
        )
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        cls_flat = fg_cls.reshape(-1)
        valid_flat = fg_valid.reshape(-1).astype(jnp.float32)

        pooled = self._pooler(self.mask_pooler_resolution)(feats, boxes_flat, batch_idx)
        mask_logits = self.mask_head(pooled, train=True)  # [R, M, M, C]
        C = mask_logits.shape[-1]

        # matched gt's annotated points, in the proposal frame
        P = targets["gt_point_coords"].shape[2]
        pc = jnp.take_along_axis(
            targets["gt_point_coords"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, P, 2)
        pl = jnp.take_along_axis(
            targets["gt_point_labels"], fg_gt_idx[..., None], axis=1
        ).reshape(B * Rf, P)
        coords, labels, weights = get_point_coords_from_point_annotation(boxes_flat, pc, pl)

        point_logits = point_sample(mask_logits, coords)  # [R, P, C]
        if C == 1:
            sel = point_logits[..., 0]
        else:
            ci = jnp.clip(cls_flat, 0, C - 1).astype(jnp.int32)
            sel = jnp.take_along_axis(point_logits, ci[:, None, None], axis=-1)[..., 0]

        bce = binary_cross_entropy_with_logits(sel, labels)
        w = weights * valid_flat[:, None]
        loss = (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
        return {"loss_mask": loss}


@ROI_HEADS_REGISTRY.register()
class ImplicitPointRendPointSupROIHeads(ImplicitPointRendROIHeads):
    """Implicit PointRend trained from point annotations only (reference
    point_sup/mask_head.py ImplicitPointRendPointSupHead): identical to
    Implicit PointRend except the training points are the matched gt's
    annotated points instead of uniform box samples — gt_masks never used."""

    def _forward_mask_train(self, feats, sampled, targets):
        assert "gt_point_coords" in targets, (
            "ImplicitPointRendPointSupROIHeads needs gt_point_coords/gt_point_labels"
        )
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        cls_flat = fg_cls.reshape(-1)
        valid_flat = fg_valid.reshape(-1).astype(jnp.float32)

        params = self.parameter_head(
            self._coarse_pool(feats, boxes_flat, batch_idx), train=True
        )
        w_mask = valid_flat[:, None]
        loss_l2 = self.params_l2_regularizer * ((params**2) * w_mask).sum() / jnp.maximum(
            w_mask.sum() * params.shape[1], 1.0
        )

        P = targets["gt_point_coords"].shape[2]
        pc = jnp.take_along_axis(
            targets["gt_point_coords"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, P, 2)
        pl = jnp.take_along_axis(
            targets["gt_point_labels"], fg_gt_idx[..., None], axis=1
        ).reshape(B * Rf, P)
        coords, labels, weights = get_point_coords_from_point_annotation(boxes_flat, pc, pl)

        fine, _ = point_sample_fine_grained_features(
            self._point_features(feats), self.point_scales, boxes_flat, batch_idx, coords
        )
        point_logits = self.point_head(fine, coords, params, train=True)  # [R, P, C]
        C = point_logits.shape[-1]
        if C == 1:
            sel = point_logits[..., 0]
        else:
            ci = jnp.clip(cls_flat, 0, C - 1).astype(jnp.int32)
            sel = jnp.take_along_axis(point_logits, ci[:, None, None], axis=-1)[..., 0]
        bce = binary_cross_entropy_with_logits(sel, labels)
        w = weights * valid_flat[:, None]
        loss = (bce * w).sum() / jnp.maximum(w.sum(), 1.0)
        return {"loss_mask_point": loss, "loss_l2": loss_l2}
