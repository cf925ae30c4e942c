"""DensePose ROI heads
(reference projects/DensePose/densepose/roi_heads.py + losses in
densepose/modeling/losses/chart.py).

Training losses, all at the annotated points (DensePose GT is ~100 labeled
points per person):
- fine_segm: CE over 25 part classes at annotated points;
- u / v: smooth-L1 between the gt chart coords and the predicted U/V of the
  GT part channel at each point;
- coarse_segm: CE (fg = any annotated part) at the points.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_tpu.layers.losses import smooth_l1_loss
from detectron2_tpu.modeling.roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    StandardROIHeads,
    select_foreground_slots,
)
from detectron2_tpu.modeling.poolers import ROIPooler
from detectron2_tpu.projects.densepose.densepose_head import (
    DensePoseDecoder,
    build_densepose_head,
    build_densepose_predictor,
)
from detectron2_tpu.projects.point_rend.point_features import point_sample
from detectron2_tpu.projects.point_sup.point_utils import (
    get_point_coords_from_point_annotation,
)

__all__ = ["DensePoseROIHeads"]


@ROI_HEADS_REGISTRY.register()
class DensePoseROIHeads(StandardROIHeads):
    """StandardROIHeads + the DensePose IUV branch."""

    densepose_head: Optional[nn.Module] = None
    densepose_predictor: Optional[nn.Module] = None
    decoder: Optional[nn.Module] = None
    densepose_pooler_resolution: int = 28
    densepose_pooler_sampling_ratio: int = 2
    index_weight: float = 5.0
    part_weight: float = 1.0
    point_regression_weight: float = 0.01
    uv_confidence: str = "none"  # none | iid_iso | indep_aniso
    cse_embedder: Optional[nn.Module] = None
    cse_mesh_name: str = "smpl_27554"
    embdist_gauss_sigma: float = 0.01
    embed_loss_weight: float = 0.6
    # "EmbeddingLoss" (one-hot GT vertex) or "SoftEmbeddingLoss" (geodesic
    # soft targets; the reference's *_soft_* configs, losses/soft_embed.py)
    embed_loss_name: str = "EmbeddingLoss"
    geodist_gauss_sigma: float = 0.01
    # [K, K] mesh geodesic distances, required by SoftEmbeddingLoss; loaded
    # host-side (cse.load_mesh_data) and closed over as a constant
    mesh_geodists: Optional[jnp.ndarray] = None
    # parity/debug escape hatch: attach the raw predictor maps at inference
    raw_outputs: bool = False

    @classmethod
    def from_config(cls, cfg, input_shape):
        base = StandardROIHeads.from_config.__func__(cls, cfg, input_shape)
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        cse_embedder = None
        mesh_name = "smpl_27554"
        if cfg.MODEL.DENSEPOSE_ON and "Embedding" in h.PREDICTOR_NAME:
            from detectron2_tpu.projects.densepose.cse import Embedder

            specs = tuple(
                (name, int(n), int(h.CSE.EMBED_SIZE)) for name, n in h.CSE.EMBEDDERS
            )
            cse_embedder = Embedder(mesh_specs=specs)
            mesh_name = specs[0][0]
        conf = h.UV_CONFIDENCE
        decoder = None
        if cfg.MODEL.DENSEPOSE_ON and h.DECODER_ON:
            decoder = DensePoseDecoder.from_config(
                cfg, input_shape, cfg.MODEL.ROI_HEADS.IN_FEATURES
            )
        return base.clone(
            densepose_head=build_densepose_head(cfg) if cfg.MODEL.DENSEPOSE_ON else None,
            densepose_predictor=(
                build_densepose_predictor(cfg) if cfg.MODEL.DENSEPOSE_ON else None
            ),
            decoder=decoder,
            densepose_pooler_resolution=h.POOLER_RESOLUTION,
            densepose_pooler_sampling_ratio=h.POOLER_SAMPLING_RATIO,
            index_weight=h.INDEX_WEIGHTS,
            part_weight=h.PART_WEIGHTS,
            point_regression_weight=h.POINT_REGRESSION_WEIGHTS,
            uv_confidence=conf.TYPE if conf.ENABLED else "none",
            cse_embedder=cse_embedder,
            cse_mesh_name=mesh_name,
            embdist_gauss_sigma=h.CSE.EMBEDDING_DIST_GAUSS_SIGMA,
            embed_loss_weight=h.CSE.EMBED_LOSS_WEIGHT,
            embed_loss_name=h.CSE.EMBED_LOSS_NAME,
            geodist_gauss_sigma=h.CSE.GEODESIC_DIST_GAUSS_SIGMA,
            raw_outputs=bool(getattr(h, "RAW_OUTPUTS", False)),
        )

    # the densepose branch piggybacks on the mask hooks so the standard
    # control flow drives it without re-implementing __call__
    def _has_mask_branch(self) -> bool:
        return self.mask_head is not None or self.densepose_head is not None

    def _forward_mask_train(self, feats, sampled, targets):
        losses = {}
        if self.mask_head is not None:
            losses.update(super()._forward_mask_train(feats, sampled, targets))
        if self.densepose_head is not None and "gt_dp_points" in targets:
            losses.update(self._forward_densepose_train(feats, sampled, targets))
        return losses

    def _forward_mask_inference(self, feats, detections):
        if self.mask_head is not None:
            detections = super()._forward_mask_inference(feats, detections)
        if self.densepose_head is not None:
            detections = self._forward_densepose_inference(feats, detections)
        return detections

    def _densepose_pool(self, feats, boxes_flat, batch_idx, train):
        """Pool densepose features: with the decoder, pool from its single
        stride-4 output map (reference roi_head.py:112-118, 160-164);
        otherwise from the raw FPN levels. Uses the densepose pooler's own
        sampling ratio."""
        if self.decoder is not None:
            feats = [self.decoder(feats, train=train)]
            scales = (self.pooler_scales[0],)
        else:
            scales = self.pooler_scales
        pooler = ROIPooler(
            output_size=self.densepose_pooler_resolution,
            scales=scales,
            sampling_ratio=self.densepose_pooler_sampling_ratio,
            pooler_type=self.pooler_type,
        )
        return pooler(feats, boxes_flat, batch_idx)

    def _forward_densepose_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        Rf = self.fg_budget

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(sampled["is_fg"])
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)
        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        valid_flat = fg_valid.reshape(-1).astype(jnp.float32)

        pooled = self._densepose_pool(feats, boxes_flat, batch_idx, train=True)
        out = self.densepose_predictor(self.densepose_head(pooled, train=True), train=True)

        if self.cse_embedder is not None:
            return self._cse_losses(out, boxes_flat, fg_gt_idx, valid_flat, targets, B, Rf)
        K = out["fine_segm"].shape[-1]

        # matched gt annotations -> proposal frame
        P = targets["gt_dp_points"].shape[2]
        pts = jnp.take_along_axis(
            targets["gt_dp_points"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, P, 2)
        part = jnp.take_along_axis(
            targets["gt_dp_part"], fg_gt_idx[..., None], axis=1
        ).reshape(B * Rf, P)
        gt_u = jnp.take_along_axis(targets["gt_dp_u"], fg_gt_idx[..., None], axis=1).reshape(
            B * Rf, P
        )
        gt_v = jnp.take_along_axis(targets["gt_dp_v"], fg_gt_idx[..., None], axis=1).reshape(
            B * Rf, P
        )

        coords, _, weights = get_point_coords_from_point_annotation(
            boxes_flat, pts, jnp.where(part >= 0, 1, -1)
        )
        w = weights * valid_flat[:, None]  # [R, P]

        # fine segmentation: CE over part classes (bg=0, parts 1..24)
        fine_at = point_sample(out["fine_segm"], coords)  # [R, P, K]
        part_cls = jnp.clip(part + 1, 0, K - 1)  # annotated points are fg parts
        logp = jax.nn.log_softmax(fine_at, axis=-1)
        ce = -jnp.take_along_axis(logp, part_cls[..., None], axis=-1)[..., 0]
        loss_index = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        # coarse segmentation: annotated points are foreground (channel 1)
        coarse_at = point_sample(out["coarse_segm"], coords)
        logp_c = jax.nn.log_softmax(coarse_at, axis=-1)
        loss_coarse = (-logp_c[..., 1] * w).sum() / jnp.maximum(w.sum(), 1.0)

        # u/v regression on the GT part channel
        def at_part(channel_map):
            return jnp.take_along_axis(
                point_sample(channel_map, coords), part_cls[..., None], axis=-1
            )[..., 0]

        u_at = at_part(out["u"])
        v_at = at_part(out["v"])
        losses = {
            "loss_densepose_I": loss_index * self.part_weight,
            "loss_densepose_S": loss_coarse * self.index_weight,
        }
        if self.uv_confidence == "none":
            loss_u = (smooth_l1_loss(u_at, gt_u, beta=0.0) * w).sum() / jnp.maximum(w.sum(), 1.0)
            loss_v = (smooth_l1_loss(v_at, gt_v, beta=0.0) * w).sum() / jnp.maximum(w.sum(), 1.0)
            losses["loss_densepose_U"] = loss_u * self.point_regression_weight
            losses["loss_densepose_V"] = loss_v * self.point_regression_weight
        else:
            from detectron2_tpu.projects.densepose.confidences import (
                iid_isotropic_gaussian_uv_loss,
                indep_anisotropic_gaussian_uv_loss,
            )

            sigma_at = at_part(out["sigma_2"])
            if self.uv_confidence == "iid_iso":
                loss_uv = iid_isotropic_gaussian_uv_loss(
                    u_at, v_at, sigma_at, gt_u, gt_v, w
                )
            else:  # indep_aniso
                loss_uv = indep_anisotropic_gaussian_uv_loss(
                    u_at, v_at, sigma_at, at_part(out["kappa_u"]), at_part(out["kappa_v"]),
                    gt_u, gt_v, w,
                )
            losses["loss_densepose_UV"] = loss_uv * self.point_regression_weight
        return losses

    def _cse_losses(self, out, boxes_flat, fg_gt_idx, valid_flat, targets, B, Rf):
        """CSE branch: coarse-segm CE at annotated points + softmax embedding
        loss against the mesh vertex embeddings (reference losses/embed.py)."""
        from detectron2_tpu.projects.densepose.cse import cse_embedding_loss

        P = targets["gt_dp_points"].shape[2]
        pts = jnp.take_along_axis(
            targets["gt_dp_points"], fg_gt_idx[..., None, None], axis=1
        ).reshape(B * Rf, P, 2)
        vert = jnp.take_along_axis(
            targets["gt_dp_vertex"], fg_gt_idx[..., None], axis=1
        ).reshape(B * Rf, P)

        coords, _, weights = get_point_coords_from_point_annotation(
            boxes_flat, pts, jnp.where(vert >= 0, 1, -1)
        )
        w = weights * valid_flat[:, None]  # [R, P]

        coarse_at = point_sample(out["coarse_segm"], coords)
        logp_c = jax.nn.log_softmax(coarse_at, axis=-1)
        loss_coarse = (-logp_c[..., 1] * w).sum() / jnp.maximum(w.sum(), 1.0)

        emb_at = point_sample(out["embedding"], coords)  # [R, P, D]
        mesh_emb = self.cse_embedder(self.cse_mesh_name)  # [K, D]
        D = emb_at.shape[-1]
        if self.embed_loss_name == "SoftEmbeddingLoss":
            from detectron2_tpu.projects.densepose.cse import cse_soft_embedding_loss

            assert self.mesh_geodists is not None, (
                "SoftEmbeddingLoss needs mesh geodesic distances: set "
                "roi_heads.mesh_geodists (cse.load_mesh_data(...)['geodists'])"
            )
            loss_embed = cse_soft_embedding_loss(
                emb_at.reshape(-1, D),
                vert.reshape(-1),
                (w > 0).reshape(-1),
                mesh_emb,
                jnp.asarray(self.mesh_geodists),
                self.embdist_gauss_sigma,
                self.geodist_gauss_sigma,
            )
        else:
            loss_embed = cse_embedding_loss(
                emb_at.reshape(-1, D),
                vert.reshape(-1),
                (w > 0).reshape(-1),
                mesh_emb,
                self.embdist_gauss_sigma,
            )
        return {
            "loss_densepose_S": loss_coarse * self.index_weight,
            f"loss_densepose_E_{self.cse_mesh_name}": loss_embed * self.embed_loss_weight,
        }

    def _forward_densepose_inference(self, feats, detections):
        B, D = detections["pred_classes"].shape
        boxes_flat = detections["pred_boxes"].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)
        pooled = self._densepose_pool(feats, boxes_flat, batch_idx, train=False)
        out = self.densepose_predictor(self.densepose_head(pooled, train=False), train=False)

        if self.cse_embedder is not None:
            # CSE result format: per-pixel embedding + fg mask; closest-vertex
            # lookup happens host-side / in the evaluator (the [HW, K] argmin
            # over 27k vertices is not worth a per-step device pass)
            M = out["embedding"].shape[1]
            D_emb = out["embedding"].shape[-1]
            fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0  # [R, M, M]
            detections["pred_densepose_embedding"] = out["embedding"].reshape(
                B, D, M, M, D_emb
            )
            detections["pred_densepose_fg"] = fg.reshape(B, D, M, M)
            return detections

        if self.raw_outputs:
            B_, D_, M_ = B, D, out["fine_segm"].shape[1]
            detections["pred_densepose_raw"] = {
                k: v.reshape((B_, D_) + v.shape[1:]) for k, v in out.items()
            }

        M = out["fine_segm"].shape[1]
        # per-pixel part label + its U/V (the chart result format)
        part = jnp.argmax(out["fine_segm"], axis=-1)  # [R, M, M]
        u = jnp.take_along_axis(out["u"], part[..., None], axis=-1)[..., 0]
        v = jnp.take_along_axis(out["v"], part[..., None], axis=-1)[..., 0]
        fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0
        part = jnp.where(fg, part, 0)
        detections["pred_densepose"] = jnp.stack(
            [part.astype(jnp.float32), jnp.clip(u, 0, 1), jnp.clip(v, 0, 1)], axis=-1
        ).reshape(B, D, M, M, 3)
        return detections
