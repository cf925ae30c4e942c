"""PointRend ROI heads (reference projects/PointRend/point_rend/roi_heads.py +
mask_head.py PointRendMaskHead).

The mask branch replaces the deconv head with: a coarse 7x7 FC head, a
training-time point loss at adaptively sampled uncertain points, and an
inference-time subdivision loop (upsample 2x, refine the N most uncertain
cells with the point head). All point budgets are static so the whole loop
compiles once; the loop is unrolled python (subdivision_steps is tiny).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.modeling.roi_heads.mask_head import (
    build_mask_head,
    mask_rcnn_inference,
    mask_rcnn_loss,
)
from detectron2_tpu.modeling.roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    StandardROIHeads,
    crop_gt_masks_to_proposals,
    select_foreground_slots,
)
from detectron2_tpu.projects.point_rend.point_features import (
    generate_regular_grid_point_coords,
    get_point_coords_wrt_image,
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_sample,
    point_sample_fine_grained_features,
)
from detectron2_tpu.projects.point_rend.point_head import build_point_head, roi_mask_point_loss

__all__ = ["PointRendROIHeads", "ImplicitPointRendROIHeads"]


@ROI_HEADS_REGISTRY.register()
class PointRendROIHeads(StandardROIHeads):
    """StandardROIHeads with the PointRend mask branch."""

    point_head: Optional[nn.Module] = None
    point_in_features: Tuple[str, ...] = ("p2",)
    point_scales: Tuple[float, ...] = (0.25,)
    coarse_in_features: Tuple[str, ...] = ("p2",)
    coarse_scales: Tuple[float, ...] = (0.25,)
    coarse_pooler_resolution: int = 14
    train_num_points: int = 196
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 1
    subdivision_num_points: int = 196
    subdivision_init_resolution: int = 14

    @classmethod
    def from_config(cls, cfg, input_shape):
        # the implicit subclass replaces both heads (the reference's
        # ImplicitPointRendMaskHead subsumes them and isn't a mask head here);
        # build the standard pieces against a neutral head name
        implicit = cfg.MODEL.ROI_MASK_HEAD.NAME.startswith("ImplicitPointRend")
        if implicit:
            cfg = cfg.clone()
            cfg.defrost()
            cfg.MODEL.ROI_MASK_HEAD.NAME = "CoarseMaskHead"
        base = StandardROIHeads.from_config.__func__(cls, cfg, input_shape)
        point_in = tuple(cfg.MODEL.POINT_HEAD.IN_FEATURES)
        coarse_in = tuple(cfg.MODEL.ROI_MASK_HEAD.IN_FEATURES)
        # the reference's subdivision shortcut (mask_head.py:_init_point_head):
        # when a 2x-larger regular init grid still fits the point budget, skip
        # the step and start there
        init_res = cfg.MODEL.ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION
        steps = cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS
        num_points = cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS
        while 4 * init_res**2 <= num_points:
            init_res *= 2
            steps -= 1
        # flax modules are frozen dataclasses: clone with the extra fields
        return base.clone(
            mask_head=build_mask_head(cfg) if cfg.MODEL.MASK_ON and not implicit else None,
            point_head=build_point_head(cfg) if cfg.MODEL.MASK_ON and not implicit else None,
            point_in_features=point_in,
            point_scales=tuple(1.0 / input_shape[f].stride for f in point_in),
            coarse_in_features=coarse_in,
            coarse_scales=tuple(1.0 / input_shape[f].stride for f in coarse_in),
            coarse_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            train_num_points=cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS,
            oversample_ratio=cfg.MODEL.POINT_HEAD.OVERSAMPLE_RATIO,
            importance_sample_ratio=cfg.MODEL.POINT_HEAD.IMPORTANCE_SAMPLE_RATIO,
            subdivision_steps=max(steps, 0),
            subdivision_num_points=num_points,
            subdivision_init_resolution=init_res,
        )

    def _features_by_name(self, feats, names):
        index_of = {f: i for i, f in enumerate(self.in_features)}
        return [feats[index_of[f]] for f in names]

    def _point_features(self, feats):
        return self._features_by_name(feats, self.point_in_features)

    def _coarse_pool(self, feats, boxes_flat, batch_idx):
        """Per-roi coarse-head input: image-level features point-sampled on a
        regular cell-center grid (reference mask_head.py:_roi_pooler — the
        'RoIAlign with sampling_ratio=1' equivalent)."""
        R = boxes_flat.shape[0]
        res = self.coarse_pooler_resolution
        grid = generate_regular_grid_point_coords(R, res)
        pts, _ = point_sample_fine_grained_features(
            self._features_by_name(feats, self.coarse_in_features),
            self.coarse_scales,
            boxes_flat,
            batch_idx,
            grid,
        )
        return pts.reshape(R, res, res, pts.shape[-1])

    # ----------------------------------------------------------- mask branch
    def _forward_mask_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        cls_flat = fg_cls.reshape(-1)
        valid_flat = fg_valid.reshape(-1)

        pooled = self._coarse_pool(feats, boxes_flat, batch_idx)
        coarse = self.mask_head(pooled, train=True)  # [R, side, side, C]
        side = coarse.shape[1]

        gt_coarse = jax.vmap(
            lambda m, b, i, p: crop_gt_masks_to_proposals(m, b, i, p, side)
        )(targets["gt_masks"], targets["gt_boxes"], fg_gt_idx, fg_boxes)
        loss_mask = mask_rcnn_loss(
            coarse, cls_flat, gt_coarse.reshape(-1, side, side), valid_flat
        )

        # adaptive point sampling on the (non-differentiable) coarse prediction
        rng = self.make_rng("sampling")
        coords = get_uncertain_point_coords_with_randomness(
            rng,
            jax.lax.stop_gradient(coarse),
            cls_flat,
            self.train_num_points,
            self.oversample_ratio,
            self.importance_sample_ratio,
        )  # [R, P, 2] box-relative

        fine, abs_coords = point_sample_fine_grained_features(
            self._point_features(feats), self.point_scales, boxes_flat, batch_idx, coords
        )
        coarse_at = point_sample(coarse, coords)
        point_logits = self.point_head(fine, coarse_at, train=True)

        # gt labels at the sampled points: map image-absolute points into each
        # matched gt's mask-crop frame and bilinear-sample its bitmask
        gt_masks_sel = jnp.take_along_axis(
            targets["gt_masks"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, *targets["gt_masks"].shape[2:])
        gt_boxes_sel = jnp.take_along_axis(
            targets["gt_boxes"], fg_gt_idx[..., None], axis=1
        ).reshape(-1, 4)
        gx0, gy0 = gt_boxes_sel[:, 0], gt_boxes_sel[:, 1]
        gw = jnp.maximum(gt_boxes_sel[:, 2] - gx0, 1e-4)
        gh = jnp.maximum(gt_boxes_sel[:, 3] - gy0, 1e-4)
        norm = jnp.stack(
            [
                (abs_coords[..., 0] - gx0[:, None]) / gw[:, None],
                (abs_coords[..., 1] - gy0[:, None]) / gh[:, None],
            ],
            axis=-1,
        )
        gt_points = (point_sample(gt_masks_sel[..., None], norm)[..., 0] >= 0.5).astype(
            jnp.float32
        )
        loss_point = roi_mask_point_loss(point_logits, cls_flat, gt_points, valid_flat)
        return {"loss_mask": loss_mask, "loss_mask_point": loss_point}

    def _forward_mask_inference(self, feats, detections):
        """Subdivision inference (reference mask_head.py:_subdivision_inference):
        an initial regular-grid point-head evaluation at the (shortcut-doubled)
        init resolution, then ``subdivision_steps`` rounds of 2x bilinear
        upsampling + re-evaluating the N most uncertain cells."""
        B, D = detections["pred_classes"].shape
        boxes_flat = detections["pred_boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
        classes = detections["pred_classes"].reshape(-1)
        R = boxes_flat.shape[0]

        coarse = self.mask_head(self._coarse_pool(feats, boxes_flat, batch_idx), train=False)
        point_feats = self._point_features(feats)

        def eval_points(coords):
            fine, _ = point_sample_fine_grained_features(
                point_feats, self.point_scales, boxes_flat, batch_idx, coords
            )
            coarse_at = point_sample(coarse, coords)
            return self.point_head(fine, coarse_at, train=False)  # [R, P, C]

        init = self.subdivision_init_resolution
        point_logits = eval_points(generate_regular_grid_point_coords(R, init))
        C = point_logits.shape[-1]
        # grid points are h-major, so this lands [R, h, w, C]
        logits = point_logits.reshape(R, init, init, C)
        cls_idx = jnp.clip(classes, 0, C - 1).astype(jnp.int32)

        for _ in range(self.subdivision_steps):
            Rh, H, W = logits.shape[0], logits.shape[1], logits.shape[2]
            logits = jax.image.resize(logits, (Rh, H * 2, W * 2, C), method="bilinear")
            if C == 1:
                sel = logits[..., 0]
            else:
                sel = jnp.take_along_axis(logits, cls_idx[:, None, None, None], axis=-1)[..., 0]
            idx, coords = get_uncertain_point_coords_on_grid(
                -jnp.abs(sel), self.subdivision_num_points
            )
            point_logits = eval_points(coords)  # [R, N, C]
            flat = logits.reshape(R, -1, C)
            flat = flat.at[jnp.arange(R)[:, None], idx].set(point_logits)
            logits = flat.reshape(R, H * 2, W * 2, C)

        probs = mask_rcnn_inference(logits, classes)
        M = probs.shape[-1]
        detections["pred_masks"] = probs.reshape(B, D, M, M)
        return detections


@ROI_HEADS_REGISTRY.register()
class ImplicitPointRendROIHeads(PointRendROIHeads):
    """Implicit PointRend (reference mask_head.py ImplicitPointRendMaskHead):
    instead of a coarse mask, a parameter head predicts a per-instance MLP
    from the pooled RoI features; the point head applies that MLP to
    Fourier-encoded point coordinates (+ image features). Training samples
    points UNIFORMLY in the box; inference runs the same subdivision loop
    seeded by a regular-grid evaluation."""

    parameter_head: Optional[nn.Module] = None
    params_l2_regularizer: float = 1e-5

    @classmethod
    def from_config(cls, cfg, input_shape):
        base = PointRendROIHeads.from_config.__func__(cls, cfg, input_shape)
        from detectron2_tpu.projects.point_rend.coarse_mask_head import ImplicitParameterHead
        from detectron2_tpu.projects.point_rend.point_head import ImplicitPointHead

        point_head = ImplicitPointHead.from_config(cfg)
        param_head = ImplicitParameterHead(
            num_params=point_head.num_params,
            conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
            fc_dims=tuple([cfg.MODEL.ROI_MASK_HEAD.FC_DIM] * cfg.MODEL.ROI_MASK_HEAD.NUM_FC),
        )
        # no coarse mask head; subdivision starts from a regular grid whose
        # resolution is sqrt(SUBDIVISION_NUM_POINTS) (reference :388-395)
        init_res = int(cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS ** 0.5)
        assert init_res * init_res == cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS
        return base.clone(
            mask_head=None,
            point_head=point_head,
            parameter_head=param_head,
            subdivision_init_resolution=init_res,
            subdivision_steps=cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS,
            params_l2_regularizer=cfg.MODEL.IMPLICIT_POINTREND.PARAMS_L2_REGULARIZER,
        )

    def _has_mask_branch(self) -> bool:
        return self.parameter_head is not None

    def _forward_mask_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_cls = jnp.take_along_axis(sampled["gt_classes"], fg_idx, axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)

        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        cls_flat = fg_cls.reshape(-1)
        valid_flat = fg_valid.reshape(-1)
        R = boxes_flat.shape[0]

        params = self.parameter_head(
            self._coarse_pool(feats, boxes_flat, batch_idx), train=True
        )  # [R, num_params]
        # L2 regularizer, masked mean over valid instances' parameters
        # (reference :407 uses a plain mean — it has no padding slots)
        w = valid_flat.astype(jnp.float32)[:, None]
        loss_l2 = self.params_l2_regularizer * ((params**2) * w).sum() / jnp.maximum(
            w.sum() * params.shape[1], 1.0
        )

        # uniform point sampling in the box (reference _uniform_sample_train_points)
        coords = jax.random.uniform(
            self.make_rng("sampling"), (R, self.train_num_points, 2)
        )
        fine, abs_coords = point_sample_fine_grained_features(
            self._point_features(feats), self.point_scales, boxes_flat, batch_idx, coords
        )
        point_logits = self.point_head(fine, coords, params, train=True)

        gt_masks_sel = jnp.take_along_axis(
            targets["gt_masks"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, *targets["gt_masks"].shape[2:])
        gt_boxes_sel = jnp.take_along_axis(
            targets["gt_boxes"], fg_gt_idx[..., None], axis=1
        ).reshape(-1, 4)
        gx0, gy0 = gt_boxes_sel[:, 0], gt_boxes_sel[:, 1]
        gw = jnp.maximum(gt_boxes_sel[:, 2] - gx0, 1e-4)
        gh = jnp.maximum(gt_boxes_sel[:, 3] - gy0, 1e-4)
        norm = jnp.stack(
            [
                (abs_coords[..., 0] - gx0[:, None]) / gw[:, None],
                (abs_coords[..., 1] - gy0[:, None]) / gh[:, None],
            ],
            axis=-1,
        )
        gt_points = (point_sample(gt_masks_sel[..., None], norm)[..., 0] >= 0.5).astype(
            jnp.float32
        )
        loss_point = roi_mask_point_loss(point_logits, cls_flat, gt_points, valid_flat)
        return {"loss_mask_point": loss_point, "loss_l2": loss_l2}

    def _forward_mask_inference(self, feats, detections):
        B, D = detections["pred_classes"].shape
        boxes_flat = detections["pred_boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
        classes = detections["pred_classes"].reshape(-1)
        R = boxes_flat.shape[0]

        params = self.parameter_head(
            self._coarse_pool(feats, boxes_flat, batch_idx), train=False
        )
        point_feats = self._point_features(feats)

        def eval_points(coords):
            fine, _ = point_sample_fine_grained_features(
                point_feats, self.point_scales, boxes_flat, batch_idx, coords
            )
            return self.point_head(fine, coords, params, train=False)  # [R, P, C]

        init = self.subdivision_init_resolution
        point_logits = eval_points(generate_regular_grid_point_coords(R, init))
        C = point_logits.shape[-1]
        logits = point_logits.reshape(R, init, init, C)
        cls_idx = jnp.clip(classes, 0, C - 1).astype(jnp.int32)

        for _ in range(self.subdivision_steps):
            Rh, H, W = logits.shape[0], logits.shape[1], logits.shape[2]
            logits = jax.image.resize(logits, (Rh, H * 2, W * 2, C), method="bilinear")
            if C == 1:
                sel = logits[..., 0]
            else:
                sel = jnp.take_along_axis(logits, cls_idx[:, None, None, None], axis=-1)[..., 0]
            idx, coords = get_uncertain_point_coords_on_grid(
                -jnp.abs(sel), self.subdivision_num_points
            )
            point_logits = eval_points(coords)
            flat = logits.reshape(R, -1, C)
            flat = flat.at[jnp.arange(R)[:, None], idx].set(point_logits)
            logits = flat.reshape(R, H * 2, W * 2, C)

        probs = mask_rcnn_inference(logits, classes)
        M = probs.shape[-1]
        detections["pred_masks"] = probs.reshape(B, D, M, M)
        return detections
