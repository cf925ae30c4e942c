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
    # all embedder mesh names, in spec order; multi-mesh configs (the animal
    # CSE family) route each instance's points to its own mesh's embed loss
    cse_mesh_names: tuple = ("smpl_27554",)
    # MeshCatalog global mesh id -> local index into cse_mesh_names (-1
    # elsewhere), static; used to decode targets["gt_dp_mesh_id"]
    cse_mesh_id_lookup: Optional[tuple] = None
    embdist_gauss_sigma: float = 0.01
    embed_loss_weight: float = 0.6
    # "EmbeddingLoss" (one-hot GT vertex) or "SoftEmbeddingLoss" (geodesic
    # soft targets; the reference's *_soft_* configs, losses/soft_embed.py)
    embed_loss_name: str = "EmbeddingLoss"
    geodist_gauss_sigma: float = 0.01
    # [K, K] mesh geodesic distances (or mesh_name -> [K, K] dict for
    # multi-mesh), required by SoftEmbeddingLoss; loaded host-side
    # (cse.load_mesh_data / meshes.create_mesh) and closed over as constants
    mesh_geodists: Optional[jnp.ndarray] = None
    # shape-to-shape cycle-consistency loss (reference losses/
    # cycle_shape2shape.py; the m2m evolution configs)
    shape2shape_on: bool = False
    shape2shape_weight: float = 0.025
    shape2shape_temperature: float = 0.05
    shape2shape_norm_p: int = 2
    # per-mesh (name, vertex_idx, geodists_sub) constants from
    # cse.build_cycle_mesh_data; required when shape2shape_on
    cycle_mesh_data: Optional[tuple] = None
    # pixel-to-shape cycle-consistency loss (reference losses/
    # cycle_pix2shape.py; the i2m evolution configs)
    pix2shape_on: bool = False
    pix2shape_weight: float = 0.0001
    pix2shape_num_pixels: int = 100
    pix2shape_temp_pix2v: float = 0.05
    pix2shape_temp_v2pix: float = 0.05
    pix2shape_norm_p: int = 2
    pix2shape_all_meshes: bool = False
    # train coarse_segm against rasterized GT masks instead of at annotated
    # points (reference losses/mask_or_segm.py + mask.py)
    segm_trained_by_masks: bool = False
    # parity/debug escape hatch: attach the raw predictor maps at inference
    raw_outputs: bool = False
    # inference head budget: the dp conv stack (8x512ch on 28x28 pooled maps,
    # ~30 GFLOP per roi) runs only on the top-K score-sorted detection slots
    # (fast_rcnn_inference_padded emits slots in descending score order, so
    # slot slicing IS top-K). The DensePose protocol scores at most
    # maxDets=20 detections per image, so the default 24 is metric-lossless
    # while cutting the padded head cost ~4x vs DETECTIONS_PER_IMAGE=100.
    # 0 = run on every slot.
    max_inference_instances: int = 24
    # train head budget: the reference's DensePoseDataFilter trains the dp
    # branch ONLY on proposals with IoU >= FG_IOU_THRESHOLD against a
    # dp-annotated gt (densepose/modeling/filter.py:13-95) — typically a
    # handful per COCO-DensePose image. The padded equivalent selects up to
    # this many qualifying slots (vs the generic 128-slot fg budget, which
    # made the 8x512ch conv tower the whole train step). 0 = generic budget.
    max_train_instances: int = 32
    densepose_fg_iou_threshold: float = 0.7

    @classmethod
    def from_config(cls, cfg, input_shape):
        base = StandardROIHeads.from_config.__func__(cls, cfg, input_shape)
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        cse_embedder = None
        mesh_name = "smpl_27554"
        mesh_names = (mesh_name,)
        mesh_id_lookup = None
        s2s = h.CSE.SHAPE_TO_SHAPE_CYCLE_LOSS
        p2s = h.CSE.PIX_TO_SHAPE_CYCLE_LOSS
        cycle_mesh_data = None
        if cfg.MODEL.DENSEPOSE_ON and "Embedding" in h.PREDICTOR_NAME:
            from detectron2_tpu.projects.densepose.cse import (
                Embedder,
                build_cycle_mesh_data,
                embedder_specs_from_cfg,
            )
            from detectron2_tpu.projects.densepose.meshes import MeshCatalog

            specs = embedder_specs_from_cfg(cfg)
            # empty EMBEDDERS -> embedder stays None, like the reference's
            # build_densepose_embedder (densepose/modeling/build.py:87-89)
            cse_embedder = Embedder(mesh_specs=specs) if specs else None
            mesh_names = tuple(s[0] for s in specs) or (mesh_name,)
            mesh_name = mesh_names[0]
            lookup = [-1] * (MeshCatalog.max_mesh_id + 2)
            for li, nm in enumerate(mesh_names):
                if nm in MeshCatalog.mesh_ids:
                    lookup[MeshCatalog.get_mesh_id(nm)] = li
            mesh_id_lookup = tuple(lookup)
            if s2s.ENABLED:
                # geodists must be staged locally (create_mesh resolves the
                # catalog URLs under $DETECTRON2_DATASETS/densepose_meshes)
                cycle_mesh_data = build_cycle_mesh_data(specs, int(s2s.MAX_NUM_VERTICES))
        mesh_geodists = None
        if cse_embedder is not None and h.CSE.EMBED_LOSS_NAME == "SoftEmbeddingLoss":
            # best-effort: load per-mesh geodists from staged catalog files;
            # meshes without staged files stay absent and the loss-time assert
            # tells the user to inject them host-side
            from detectron2_tpu.projects.densepose.meshes import create_mesh

            loaded = {}
            for nm in mesh_names:
                try:
                    loaded[nm] = create_mesh(nm).get_geodists()
                except (KeyError, FileNotFoundError, OSError, AssertionError):
                    pass
            if len(loaded) == len(mesh_names):
                mesh_geodists = loaded
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
            cse_mesh_names=mesh_names,
            cse_mesh_id_lookup=mesh_id_lookup,
            embdist_gauss_sigma=h.CSE.EMBEDDING_DIST_GAUSS_SIGMA,
            embed_loss_weight=h.CSE.EMBED_LOSS_WEIGHT,
            embed_loss_name=h.CSE.EMBED_LOSS_NAME,
            geodist_gauss_sigma=h.CSE.GEODESIC_DIST_GAUSS_SIGMA,
            mesh_geodists=mesh_geodists,
            shape2shape_on=bool(s2s.ENABLED),
            shape2shape_weight=s2s.WEIGHT,
            shape2shape_temperature=s2s.TEMPERATURE,
            shape2shape_norm_p=int(s2s.NORM_P),
            cycle_mesh_data=cycle_mesh_data,
            pix2shape_on=bool(p2s.ENABLED),
            pix2shape_weight=p2s.WEIGHT,
            pix2shape_num_pixels=int(p2s.NUM_PIXELS_TO_SAMPLE),
            pix2shape_temp_pix2v=p2s.TEMPERATURE_PIXEL_TO_VERTEX,
            pix2shape_temp_v2pix=p2s.TEMPERATURE_VERTEX_TO_PIXEL,
            pix2shape_norm_p=int(p2s.NORM_P),
            pix2shape_all_meshes=bool(p2s.USE_ALL_MESHES_NOT_GT_ONLY),
            segm_trained_by_masks=bool(getattr(h, "COARSE_SEGM_TRAINED_BY_MASKS", False)),
            raw_outputs=bool(getattr(h, "RAW_OUTPUTS", False)),
            max_inference_instances=int(getattr(h, "MAX_INFERENCE_INSTANCES", 24)),
            max_train_instances=int(getattr(h, "MAX_TRAIN_INSTANCES", 32)),
            densepose_fg_iou_threshold=float(getattr(h, "FG_IOU_THRESHOLD", 0.7)),
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
            # single stride-4 decoder map: big-footprint pool (person boxes
            # span up to ~300 feature px at stride 4) -> the exact separable
            # MXU formulation; both call sites emit K contiguous rois per
            # image (batch_idx = repeat(arange(B), K)), which is the layout
            # roi_align_separable_chan batches over
            from detectron2_tpu.ops.roi_align import roi_align_separable_chan

            dec = self.decoder(feats, train=train)
            B = dec.shape[0]
            K = boxes_flat.shape[0] // B
            res = self.densepose_pooler_resolution
            if isinstance(res, int):
                res = (res, res)
            out = roi_align_separable_chan(
                dec,
                boxes_flat.reshape(B, K, 4),
                res,
                spatial_scale=self.pooler_scales[0],
                sampling_ratio=self.densepose_pooler_sampling_ratio,
                aligned=self.pooler_type == "ROIAlignV2",
            )
            return out.reshape(B * K, res[0], res[1], dec.shape[-1])
        pooler = ROIPooler(
            output_size=self.densepose_pooler_resolution,
            scales=self.pooler_scales,
            sampling_ratio=self.densepose_pooler_sampling_ratio,
            pooler_type=self.pooler_type,
        )
        return pooler(feats, boxes_flat, batch_idx)

    def _densepose_train_mask(self, sampled, targets):
        """Which sampled slots qualify for the dp branch: foreground, IoU
        against the matched gt >= FG_IOU_THRESHOLD, and the gt actually
        carries dp supervision (annotated points; or any valid gt when the
        coarse segm trains on masks) — the reference DensePoseDataFilter's
        rule, in padded form."""
        from detectron2_tpu.structures.boxes import matched_pairwise_iou

        gt_boxes = jnp.take_along_axis(
            targets["gt_boxes"], sampled["gt_idx"][..., None], axis=1
        )  # [B, S, 4]
        iou = jax.vmap(matched_pairwise_iou)(gt_boxes, sampled["boxes"])  # [B, S]
        has_pts = None  # [B, G]; chart batches carry parts, CSE may be vertex-only
        if "gt_dp_part" in targets:
            has_pts = (targets["gt_dp_part"] >= 0).any(-1)
        if "gt_dp_vertex" in targets:
            has_v = (targets["gt_dp_vertex"] >= 0).any(-1)
            has_pts = has_v if has_pts is None else has_pts | has_v
        if has_pts is None:
            has_pts = jnp.ones(targets["gt_boxes"].shape[:2], bool)
        if self.segm_trained_by_masks and "gt_valid" in targets:
            has_pts = has_pts | targets["gt_valid"]
        slot_has_pts = jnp.take_along_axis(has_pts, sampled["gt_idx"], axis=1)
        return sampled["is_fg"] & (iou >= self.densepose_fg_iou_threshold) & slot_has_pts

    def _forward_densepose_train(self, feats, sampled, targets):
        B, S = sampled["gt_classes"].shape
        if self.max_train_instances > 0:
            Rf = min(self.max_train_instances, self.fg_budget)
            dp_mask = self._densepose_train_mask(sampled, targets)
        else:
            Rf = self.fg_budget
            dp_mask = sampled["is_fg"]

        fg_idx, fg_valid = jax.vmap(lambda m: select_foreground_slots(m, Rf))(dp_mask)
        fg_boxes = jnp.take_along_axis(sampled["boxes"], fg_idx[..., None], axis=1)
        fg_gt_idx = jnp.take_along_axis(sampled["gt_idx"], fg_idx, axis=1)
        boxes_flat = fg_boxes.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), Rf)
        valid_flat = fg_valid.reshape(-1).astype(jnp.float32)

        pooled = self._densepose_pool(feats, boxes_flat, batch_idx, train=True)
        out = self.densepose_predictor(self.densepose_head(pooled, train=True), train=True)

        if "embedding" in out:  # CSE predictor
            assert self.cse_embedder is not None, (
                "CSE training needs MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS; the "
                "abstract cse base config builds without an embedder (inference/"
                "conversion only), matching the reference's None embedder"
            )
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

        # coarse segmentation: annotated points are foreground (channel 1),
        # or dense mask CE when COARSE_SEGM_TRAINED_BY_MASKS
        if self.segm_trained_by_masks:
            loss_coarse = self._coarse_segm_mask_loss(
                out, targets, fg_gt_idx, boxes_flat, valid_flat, B, Rf
            )
        else:
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

    def _coarse_segm_mask_loss(self, out, targets, fg_gt_idx, boxes_flat, valid_flat, B, Rf):
        """COARSE_SEGM_TRAINED_BY_MASKS: dense CE of coarse_segm against the
        GT instance mask rasterized into each proposal at the segm resolution
        (reference losses/mask.py:126-143 via extract_data_for_mask_loss).
        Weighted mean over valid instances (all instances have equal pixel
        counts here, so this equals the reference's flat pixel mean)."""
        from detectron2_tpu.modeling.roi_heads.roi_heads import (
            crop_gt_masks_to_proposals,
        )

        assert "gt_masks" in targets, (
            "COARSE_SEGM_TRAINED_BY_MASKS needs rasterized gt masks in the "
            "batch targets"
        )
        S = out["coarse_segm"].shape[1]
        fg_boxes = boxes_flat.reshape(B, Rf, 4)
        m = jax.vmap(
            lambda gm, gb, gi, b: crop_gt_masks_to_proposals(gm, gb, gi, b, S)
        )(targets["gt_masks"], targets["gt_boxes"], fg_gt_idx, fg_boxes)
        tgt = (m > 0.5).reshape(B * Rf, S, S).astype(jnp.int32)
        logp = jax.nn.log_softmax(out["coarse_segm"], axis=-1)  # [R, S, S, C]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        per_inst = nll.mean(axis=(1, 2))  # [R]
        w = valid_flat
        return (per_inst * w).sum() / jnp.maximum(w.sum(), 1.0)

    def _mesh_geodists_for(self, name):
        gd = self.mesh_geodists
        assert gd is not None, (
            "SoftEmbeddingLoss needs mesh geodesic distances: set "
            "roi_heads.mesh_geodists (cse.load_mesh_data(...)['geodists'], or "
            "a {mesh_name: geodists} dict for multi-mesh configs)"
        )
        from collections.abc import Mapping

        if isinstance(gd, Mapping):  # plain dict or flax FrozenDict
            return jnp.asarray(gd[name])
        return jnp.asarray(gd)

    def _embed_loss_one_mesh(self, emb_flat, vert_flat, valid_flat_pts, name):
        """Embedding loss of all annotated points against ONE mesh's vertex
        embeddings; callers mask ``valid_flat_pts`` down to the points whose
        GT mesh is ``name`` (reference losses/embed.py computes per-mesh
        point subsets dynamically; here every mesh sees the full padded
        point set with a mesh-routing mask — fixed shapes, one [P, K] MXU
        matmul per mesh)."""
        from detectron2_tpu.projects.densepose.cse import (
            cse_embedding_loss,
            cse_soft_embedding_loss,
        )

        mesh_emb = self.cse_embedder(name)  # [K, D]
        if self.embed_loss_name == "SoftEmbeddingLoss":
            return cse_soft_embedding_loss(
                emb_flat,
                vert_flat,
                valid_flat_pts,
                mesh_emb,
                self._mesh_geodists_for(name),
                self.embdist_gauss_sigma,
                self.geodist_gauss_sigma,
            )
        return cse_embedding_loss(
            emb_flat, vert_flat, valid_flat_pts, mesh_emb, self.embdist_gauss_sigma
        )

    def _cse_losses(self, out, boxes_flat, fg_gt_idx, valid_flat, targets, B, Rf):
        """CSE branch: coarse-segm CE at annotated points + per-mesh softmax
        embedding losses against the mesh vertex embeddings (reference
        losses/cse.py DensePoseCseLoss + losses/embed.py), plus the optional
        evolution cycle-consistency losses."""
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

        if self.segm_trained_by_masks:
            loss_coarse = self._coarse_segm_mask_loss(
                out, targets, fg_gt_idx, boxes_flat, valid_flat, B, Rf
            )
        else:
            coarse_at = point_sample(out["coarse_segm"], coords)
            logp_c = jax.nn.log_softmax(coarse_at, axis=-1)
            loss_coarse = (-logp_c[..., 1] * w).sum() / jnp.maximum(w.sum(), 1.0)

        emb_at = point_sample(out["embedding"], coords)  # [R, P, D]
        D = emb_at.shape[-1]
        emb_flat = emb_at.reshape(-1, D)
        vert_flat = vert.reshape(-1)
        losses = {"loss_densepose_S": loss_coarse * self.index_weight}

        # per-instance local mesh index (into cse_mesh_names); None when the
        # batch carries no mesh ids (single-mesh pipelines)
        local_ids = None
        if len(self.cse_mesh_names) > 1 or self.pix2shape_on:
            if "gt_dp_mesh_id" in targets and self.cse_mesh_id_lookup is not None:
                gmid = jnp.take_along_axis(
                    targets["gt_dp_mesh_id"], fg_gt_idx, axis=1
                ).reshape(-1)  # [R] global MeshCatalog ids
                lut = jnp.asarray(self.cse_mesh_id_lookup, jnp.int32)
                local_ids = jnp.where(
                    (gmid >= 0) & (gmid < lut.shape[0]),
                    lut[jnp.clip(gmid, 0, lut.shape[0] - 1)],
                    -1,
                )

        if len(self.cse_mesh_names) == 1:
            name = self.cse_mesh_names[0]
            loss_embed = self._embed_loss_one_mesh(
                emb_flat, vert_flat, (w > 0).reshape(-1), name
            )
            losses[f"loss_densepose_E_{name}"] = loss_embed * self.embed_loss_weight
        else:
            assert local_ids is not None, (
                "multi-mesh CSE training needs targets['gt_dp_mesh_id'] "
                "(DensePoseBatchCollator emits it from the annotations' "
                "ref_model fields)"
            )
            for li, name in enumerate(self.cse_mesh_names):
                wm = (w > 0) & (local_ids == li)[:, None]
                loss_m = self._embed_loss_one_mesh(
                    emb_flat, vert_flat, wm.reshape(-1), name
                )
                losses[f"loss_densepose_E_{name}"] = loss_m * self.embed_loss_weight

        if self.shape2shape_on:
            losses["loss_shape2shape"] = self.shape2shape_weight * self._shape2shape_loss()
        if self.pix2shape_on:
            losses["loss_pix2shape"] = self.pix2shape_weight * self._pix2shape_loss(
                out, targets, fg_gt_idx, boxes_flat, valid_flat, local_ids, B, Rf
            )
        return losses

    def _shape2shape_loss(self):
        """Random mesh-pair cycle loss per step (reference
        cycle_shape2shape.py:39-60 cycles through shuffled pairs host-side;
        here the pair is drawn from the sampling rng and lax.switch runs only
        the selected pair's branch — the subsampled embeddings/geodists are
        compile-time constants per branch)."""
        from detectron2_tpu.projects.densepose.cse import shape_to_shape_cycle_loss

        assert self.cycle_mesh_data is not None, (
            "SHAPE_TO_SHAPE_CYCLE_LOSS needs cycle_mesh_data "
            "(cse.build_cycle_mesh_data with per-mesh geodists)"
        )
        names = [name for name, _, _ in self.cycle_mesh_data]
        assert len(names) >= 2, "shape2shape cycle loss needs >= 2 meshes"
        subs = {}
        for name, idx, geo in self.cycle_mesh_data:
            e = self.cse_embedder(name)
            subs[name] = (e if idx is None else e[idx], geo)

        pairs = [(i, j) for i in range(len(names)) for j in range(i + 1, len(names))]

        def make_branch(i, j):
            e1, g1 = subs[names[i]]
            e2, g2 = subs[names[j]]

            def branch(_):
                return shape_to_shape_cycle_loss(
                    e1, g1, e2, g2, self.shape2shape_temperature, self.shape2shape_norm_p
                )

            return branch

        branches = [make_branch(i, j) for i, j in pairs]
        if len(branches) == 1:
            return branches[0](0)
        k = jax.random.randint(self.make_rng("sampling"), (), 0, len(branches))
        return jax.lax.switch(k, branches, 0)

    def _pix2shape_loss(self, out, targets, fg_gt_idx, boxes_flat, valid_flat, local_ids, B, Rf):
        """Pixel->vertex->pixel cycle loss over the sampled fg instances
        (reference cycle_pix2shape.py:75-149: per instance x mesh, GT fg mask
        rasterized at the embedding resolution). Weighted mean over the
        (instance, mesh) pairs the reference's loops would visit: every
        instance x every mesh when USE_ALL_MESHES_NOT_GT_ONLY, else each
        instance against its own GT mesh."""
        import functools

        from detectron2_tpu.modeling.roi_heads.roi_heads import (
            crop_gt_masks_to_proposals,
        )
        from detectron2_tpu.projects.densepose.cse import pix_to_shape_cycle_loss

        assert "gt_masks" in targets, (
            "PIX_TO_SHAPE_CYCLE_LOSS needs rasterized gt masks in the batch "
            "targets (train with MODEL.MASK_ON or COARSE_SEGM_TRAINED_BY_MASKS "
            "data so the collator emits gt_masks)"
        )
        S = out["embedding"].shape[1]
        fg_boxes = boxes_flat.reshape(B, Rf, 4)
        masks = jax.vmap(
            lambda m, gb, gi, b: crop_gt_masks_to_proposals(m, gb, gi, b, S)
        )(targets["gt_masks"], targets["gt_boxes"], fg_gt_idx, fg_boxes)
        masks = (masks > 0.5).reshape(B * Rf, S, S)
        emb = out["embedding"]  # [R, S, S, D]
        rngs = jax.random.split(self.make_rng("sampling"), B * Rf)

        total = 0.0
        count = 0.0
        for li, name in enumerate(self.cse_mesh_names):
            mesh_emb = self.cse_embedder(name)
            fn = functools.partial(
                pix_to_shape_cycle_loss,
                num_pixels=self.pix2shape_num_pixels,
                temperature_pix_to_vertex=self.pix2shape_temp_pix2v,
                temperature_vertex_to_pix=self.pix2shape_temp_v2pix,
                norm_p=self.pix2shape_norm_p,
            )
            per_inst = jax.vmap(
                lambda e, m, r, me=mesh_emb: fn(e, m, me, r)
            )(emb, masks, rngs)  # [R]
            # instances with no fg pixels contribute nothing (mirrors the
            # reference skipping empty masks via its nonzero() indexing)
            has_fg = masks.any(axis=(1, 2)).astype(jnp.float32)
            wm = valid_flat * has_fg
            if not self.pix2shape_all_meshes and local_ids is not None:
                wm = wm * (local_ids == li).astype(jnp.float32)
            total = total + (per_inst * wm).sum()
            count = count + wm.sum()
        return total / jnp.maximum(count, 1.0)

    def _forward_densepose_inference(self, feats, detections):
        B, D = detections["pred_classes"].shape
        # head budget: top-K slots only (slots arrive score-sorted); outputs
        # for the remaining slots are zero (part 0 = background)
        K = D if self.max_inference_instances <= 0 else min(D, self.max_inference_instances)
        boxes_flat = detections["pred_boxes"][:, :K].reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
        pooled = self._densepose_pool(feats, boxes_flat, batch_idx, train=False)
        out = self.densepose_predictor(self.densepose_head(pooled, train=False), train=False)

        def pad_slots(x):
            """[B, K, ...] -> [B, D, ...] (zeros for the un-run slots)."""
            if K == D:
                return x
            return jnp.pad(x, [(0, 0), (0, D - K)] + [(0, 0)] * (x.ndim - 2))

        if "embedding" in out:  # CSE predictor (embedder may be None, see from_config)
            if self.cse_embedder is not None and self.is_initializing():
                # materialize the embedder tables: flax only creates params
                # for modules that are CALLED, and inference never computes
                # the mesh embeddings on device (lookup is host-side) — but
                # eval-only models must still round-trip the reference's
                # roi_heads.embedder.* checkpoint slots (embedder.py:95-115)
                for nm in self.cse_mesh_names:
                    self.cse_embedder(nm)
            # CSE result format: per-pixel embedding + fg mask; closest-vertex
            # lookup happens host-side / in the evaluator (the [HW, K] argmin
            # over 27k vertices is not worth a per-step device pass)
            M = out["embedding"].shape[1]
            D_emb = out["embedding"].shape[-1]
            fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0  # [R, M, M]
            detections["pred_densepose_embedding"] = pad_slots(
                out["embedding"].reshape(B, K, M, M, D_emb)
            )
            detections["pred_densepose_fg"] = pad_slots(fg.reshape(B, K, M, M))
            return detections

        if self.raw_outputs:
            detections["pred_densepose_raw"] = {
                k: pad_slots(v.reshape((B, K) + v.shape[1:])) for k, v in out.items()
            }

        M = out["fine_segm"].shape[1]
        # per-pixel part label + its U/V (the chart result format)
        part = jnp.argmax(out["fine_segm"], axis=-1)  # [R, M, M]
        u = jnp.take_along_axis(out["u"], part[..., None], axis=-1)[..., 0]
        v = jnp.take_along_axis(out["v"], part[..., None], axis=-1)[..., 0]
        fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0
        part = jnp.where(fg, part, 0)
        detections["pred_densepose"] = pad_slots(
            jnp.stack(
                [part.astype(jnp.float32), jnp.clip(u, 0, 1), jnp.clip(v, 0, 1)], axis=-1
            ).reshape(B, K, M, M, 3)
        )
        return detections
