"""DensePose COCOeval protocol engine — numpy re-implementation of the
reference's full evaluation semantics (reference
projects/DensePose/densepose/evaluation/densepose_coco_evaluation.py:1-1305):

- GPS (geodesic point similarity): per (dt, gt) pair, the gt's annotated
  points are mapped into the dt box, the predicted IUV is read off there,
  both point sets are snapped to their closest mesh vertices per chart, and
  gps = mean(exp(-geodist^2 / (2 k^2))) with per-part normalizers k
  (computeOgps:721-778, findAllClosestVerts*:1166-1219, getDistancesUV:
  1221-1249);
- GPSM: sqrt(gps * mask-IoU) where mask IoU rasterizes the gt coarse
  segmentation (dp_masks, 256x256, zoomed to the gt box) against the
  predicted foreground labels on the image canvas (computeDPIoU:379-436);
- IOU: the mask IoU alone;
- COCOeval-style greedy matching per threshold with crowd reuse,
  ignore-ordering, the all-gt-ignored rule, and the secondary bbox-IoU >= 0.8
  rescue pass that parks unmatched detections on ignored gts
  (evaluateImg:781-925 — including its tind-pinned quirk, replicated
  bit-for-bit: the rescue pass only writes matches at the LAST threshold);
- accumulate/summarize over [T, R, K, A, M] with 101-point interpolated
  precision and the UV metric set (accumulate:926-1029, _summarizeUvs).

Inputs are plain dict lists (COCO-annotation-shaped), not pycocotools
objects: this framework's evaluators gather host-side numpy. The mesh
machinery is injected as a provider exposing the SMPL_subdiv tables
(per-part UV vertex tables, the PDIST vertex transform, the condensed
geodesic matrix) so tests can run on synthetic meshes and production loads
the DensePose release files (evaluation.SmplDistanceProvider).
"""

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DensePoseEvalParams", "DensePoseCocoEvalEngine", "GeodesicMeshTables"]

logger = logging.getLogger(__name__)


class GeodesicMeshTables:
    """The mesh tables the GPS computation needs (the reference loads these
    from SMPL_subdiv.mat / SMPL_SUBDIV_TRANSFORM.mat / Pdist_matrix.pkl in
    _loadGEval:255-285):

    - part_uvs: 24 arrays [2, N_i] — the (U, V) of every mesh vertex
      belonging to chart part i+1;
    - part_vert_inds: 24 arrays [N_i] — their 1-based raw vertex ids;
    - pdist_transform: [V] int — raw vertex id (1-based, indexed -1) ->
      1-based reduced vertex id into the condensed geodesic matrix;
    - part_ids: [V] int — raw vertex id (indexed -1) -> chart part 1..24;
    - mean_distances [9] / coarse_parts [25] — per-coarse-part gps
      normalizers and the fine->coarse map.
    """

    def __init__(
        self,
        part_uvs: Sequence[np.ndarray],
        part_vert_inds: Sequence[np.ndarray],
        pdist_transform: np.ndarray,
        part_ids: np.ndarray,
        pdist_matrix: np.ndarray,
        mean_distances: Optional[np.ndarray] = None,
        coarse_parts: Optional[np.ndarray] = None,
        n_reduced: Optional[int] = None,
    ):
        self.part_uvs = [np.asarray(p, np.float64) for p in part_uvs]
        self.part_vert_inds = [np.asarray(p, np.int64) for p in part_vert_inds]
        self.pdist_transform = np.asarray(pdist_transform, np.int64)
        self.part_ids = np.asarray(part_ids, np.int64)
        self.pdist_matrix = pdist_matrix
        self.mean_distances = (
            np.asarray(mean_distances, np.float64)
            if mean_distances is not None
            else np.array([0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150])
        )
        self.coarse_parts = (
            np.asarray(coarse_parts, np.int64)
            if coarse_parts is not None
            else np.array([0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8])
        )
        # the reference hardcodes n = 27554 (the SMPL_subdiv vertex count) in
        # its condensed-index arithmetic; synthetic meshes pass their own
        self.n_reduced = 27554 if n_reduced is None else int(n_reduced)

    # -- vertex lookup (reference findAllClosestVertsUV / ...GT:1166-1219)

    def closest_verts_uv(self, u_pts: np.ndarray, v_pts: np.ndarray, i_pts: np.ndarray) -> np.ndarray:
        """Points -> 1-based reduced vertex ids; 0 where the chart label is
        not in 1..24 (background / out-of-box)."""
        closest = np.ones(i_pts.shape) * -1
        for i in range(24):
            sel = i_pts == (i + 1)
            if not sel.any():
                continue
            uvs = np.array([u_pts[sel], v_pts[sel]])  # [2, n]
            table = self.part_uvs[i]  # [2, N]
            d2 = ((table[:, :, None] - uvs[:, None, :]) ** 2).sum(axis=0)  # [N, n]
            closest[sel] = self.part_vert_inds[i][np.argmin(d2, axis=0)]
        transformed = self.pdist_transform[closest.astype(int) - 1]
        transformed[closest < 0] = 0
        return transformed

    def closest_verts_gt(self, gt: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
        """gt dp points -> (raw 1-based vertex ids with -1 for bad labels,
        reduced ids with 0 for bad labels)."""
        i_gt = np.array(gt["dp_I"])
        u_gt = np.array(gt["dp_U"])
        v_gt = np.array(gt["dp_V"])
        closest = np.ones(i_gt.shape) * -1
        for i in range(24):
            sel = i_gt == (i + 1)
            if not sel.any():
                continue
            uvs = np.array([u_gt[sel], v_gt[sel]])
            table = self.part_uvs[i]
            d2 = ((table[:, :, None] - uvs[:, None, :]) ** 2).sum(axis=0)
            closest[sel] = self.part_vert_inds[i][np.argmin(d2, axis=0)]
        transformed = self.pdist_transform[closest.astype(int) - 1]
        transformed[closest < 0] = 0
        return closest, transformed

    # -- geodesic lookup (reference getDistancesUV:1221-1249)

    def distances(self, c_verts_gt_t: np.ndarray, c_verts_dt_t: np.ndarray) -> np.ndarray:
        """Per-point geodesics for gt points with a valid vertex; inf where
        the prediction has none. Uses the reference's condensed-matrix index
        arithmetic verbatim."""
        n = self.n_reduced
        dists = []
        for d in range(len(c_verts_gt_t)):
            if c_verts_gt_t[d] > 0:
                if c_verts_dt_t[d] > 0:
                    i = int(c_verts_gt_t[d]) - 1
                    j = int(c_verts_dt_t[d]) - 1
                    if j == i:
                        dists.append(0)
                        continue
                    # the reference keeps i as the LARGER of the pair before
                    # the condensed-index mapping (getDistancesUV:1229-1247
                    # swaps only when j > i)
                    if j > i:
                        i, j = j, i
                    i = n - i - 1
                    j = n - j - 1
                    k = (n * (n - 1) / 2) - (n - i) * ((n - i) - 1) / 2 + j - i - 1
                    k = (n * n - n) / 2 - k - 1
                    dists.append(float(np.asarray(self.pdist_matrix[int(k)]).reshape(-1)[0]))
                else:
                    dists.append(np.inf)
        return np.atleast_1d(np.array(dists).squeeze())

    def norm_coeffs(self, c_verts_gt_raw: np.ndarray) -> np.ndarray:
        """Per-valid-gt-point gps normalizer k (reference
        computeOgps_single_pair_iuv:676-687)."""
        valid = c_verts_gt_raw[c_verts_gt_raw > 0].astype(int)
        return self.mean_distances[self.coarse_parts[self.part_ids[valid - 1]]]


class DensePoseEvalParams:
    """(reference Params.setUvParams:1243-1253)."""

    def __init__(self, iou_thrs: Optional[np.ndarray] = None):
        self.iouThrs = (
            np.asarray(iou_thrs)
            if iou_thrs is not None
            else np.linspace(0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        )
        self.recThrs = np.linspace(0.0, 1.00, int(np.round(1.00 / 0.01)) + 1, endpoint=True)
        self.maxDets = [20]
        self.areaRng = [[0**2, 1e5**2], [32**2, 96**2], [96**2, 1e5**2]]
        self.areaRngLbl = ["all", "medium", "large"]
        self.useCats = 1
        self.imgIds: List[Any] = []
        self.catIds: List[Any] = []


def _bbox_iou_crowd(dboxes: np.ndarray, gboxes: np.ndarray, iscrowd: Sequence[int]) -> np.ndarray:
    """pycocotools bbIou semantics: XYWH, crowd gt -> union = dt area."""
    D, G = len(dboxes), len(gboxes)
    out = np.zeros((D, G))
    for j in range(G):
        gx, gy, gw, gh = gboxes[j]
        garea = gw * gh
        for i in range(D):
            dx, dy, dw, dh = dboxes[i]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + garea - inter
            if union > 0:
                out[i, j] = inter / union
    return out


def _mask_iou_crowd(dmasks: List[np.ndarray], gmasks: List[np.ndarray], iscrowd: Sequence[int]) -> np.ndarray:
    """pycocotools rleIou semantics on binary canvas masks."""
    D, G = len(dmasks), len(gmasks)
    out = np.zeros((D, G))
    for j in range(G):
        g = gmasks[j]
        ga = int(g.sum())
        for i in range(D):
            d = dmasks[i]
            inter = int(np.logical_and(d, g).sum())
            da = int(d.sum())
            union = da if iscrowd[j] else da + ga - inter
            if union > 0:
                out[i, j] = inter / union
    return out


class DensePoseCocoEvalEngine:
    """The protocol engine. ``gts``/``dts`` are COCO-shaped dicts:

    gt: {id, image_id, category_id, bbox XYWH, area, iscrowd?, ignore?,
         dp_x/dp_y (points, 255-normalized gt-box frame), dp_I/dp_U/dp_V,
         dp_masks? (list of <=14 RLE dicts at 256x256) or segmentation?
         (binary canvas array)}
    dt: {id, image_id, category_id, bbox XYWH, score,
         densepose: [3, int(h), int(w)] uint8-valued IUV stack in the
         int-truncated dt-box frame (labels, U*255, V*255) — the reference's
         quantized results format (extract_iuv_from_quantized:655-661,
         _extract_mask:538-556)}

    ``image_sizes``: image_id -> (height, width). Optional per-image ignore
    regions come as image dicts via ``ignore_regions``: image_id -> binary
    canvas array (the reference rasterizes ignore_regions_x/y polygons;
    rasterization happens outside the engine so gt jsons and synthetic tests
    share one code path).
    """

    def __init__(
        self,
        gts: List[Dict[str, Any]],
        dts: List[Dict[str, Any]],
        image_sizes: Dict[Any, Tuple[int, int]],
        tables: GeodesicMeshTables,
        dp_eval_mode: str = "gps",
        params: Optional[DensePoseEvalParams] = None,
        ignore_regions: Optional[Dict[Any, np.ndarray]] = None,
    ):
        assert dp_eval_mode in ("gps", "gpsm", "iou"), dp_eval_mode
        self.mode = dp_eval_mode
        self.tables = tables
        self.params = params or DensePoseEvalParams()
        self.size_mapping = dict(image_sizes)
        self._ignore_regions = ignore_regions or {}
        self.ignoreThrBB = 0.7
        self.ignoreThrUV = 0.9
        self._input_gts = gts
        self._input_dts = dts
        self.evalImgs: List[Optional[Dict[str, Any]]] = []
        self.eval: Dict[str, Any] = {}
        self.stats = np.zeros(0)
        if not self.params.imgIds:
            self.params.imgIds = sorted({g["image_id"] for g in gts})
        if not self.params.catIds:
            self.params.catIds = sorted({g["category_id"] for g in gts})

    # ------------------------------------------------------------- prepare

    def _check_ignore(self, ann: Dict[str, Any], iregion: Optional[np.ndarray], is_dt: bool) -> bool:
        """(reference _prepare._checkIgnore:318-345)."""
        if iregion is None:
            return True
        bb = np.array(ann["bbox"]).astype(int)
        x1, y1 = bb[0], bb[1]
        x2 = min(bb[0] + bb[2], iregion.shape[1])
        y2 = min(bb[1] + bb[3], iregion.shape[0])
        if bb[2] * bb[3] == 0:
            return False
        crop = iregion[y1:y2, x1:x2]
        if crop.sum() == 0:
            return True
        if not (is_dt and "densepose" in ann):
            return crop.sum() / bb[2] / bb[3] < self.ignoreThrBB
        uvmask = np.asarray(self._extract_mask(ann) > 0, np.uint8)
        # pad/crop the label mask to the crop window, IoU against the region
        h, w = crop.shape
        m = np.zeros_like(crop, dtype=np.uint8)
        m[: min(h, uvmask.shape[0]), : min(w, uvmask.shape[1])] = uvmask[
            : min(h, uvmask.shape[0]), : min(w, uvmask.shape[1])
        ]
        inter = int(np.logical_and(m, crop).sum())
        union = int(m.sum())  # crowd semantics vs the region
        uviou = inter / union if union > 0 else 0.0
        return uviou < self.ignoreThrUV

    def _prepare(self):
        p = self.params
        gts = [g for g in self._input_gts if g["image_id"] in set(p.imgIds)]
        dts = [d for d in self._input_dts if d["image_id"] in set(p.imgIds)]
        for gt in gts:
            gt["ignore"] = gt.get("ignore", 0)
            gt["ignore"] = 1 if gt.get("iscrowd", 0) else gt["ignore"]
            gt["ignore"] = ("dp_x" in gt) == 0  # densepose rule (overrides)
        from collections import defaultdict

        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            ireg = self._ignore_regions.get(gt["image_id"])
            if self._check_ignore(gt, ireg, is_dt=False):
                self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            ireg = self._ignore_regions.get(dt["image_id"])
            if (dt["image_id"] not in self._ignore_regions) or self._check_ignore(dt, ireg, is_dt=True):
                self._dts[dt["image_id"], dt["category_id"]].append(dt)

    # -------------------------------------------------------------- masks

    @staticmethod
    def get_densepose_mask(polys: Sequence[Optional[Dict[str, Any]]]) -> np.ndarray:
        """dp_masks (<=14 per-part RLEs at 256x256) -> labeled 256x256 mask
        (reference getDensePoseMask:353-360)."""
        from detectron2_tpu.evaluation.rle import rle_to_mask

        mask_gen = np.zeros([256, 256])
        stop = min(len(polys) + 1, 15)
        for i in range(1, stop):
            if polys[i - 1]:
                mask_gen[rle_to_mask(polys[i - 1]) > 0] = i
        return mask_gen

    def _extract_mask(self, dt: Dict[str, Any]) -> np.ndarray:
        """Foreground label mask in the dt-box frame
        (reference _extract_mask:538-556, quantized branch)."""
        return np.asarray(dt["densepose"])[0]

    def _rlemask_on_image(self, mask: Optional[np.ndarray], img_id, ann: Dict[str, Any]) -> np.ndarray:
        """Paste a box-frame mask onto the image canvas
        (reference _generate_rlemask_on_image:362-377)."""
        x, y, w, h = np.array(ann["bbox"])
        im_h, im_w = self.size_mapping[img_id]
        im_mask = np.zeros((im_h, im_w), dtype=np.uint8)
        if mask is not None:
            x0 = max(int(x), 0)
            x1 = min(int(x + w), im_w, int(x) + mask.shape[1])
            y0 = max(int(y), 0)
            y1 = min(int(y + h), im_h, int(y) + mask.shape[0])
            y = int(y)
            x = int(x)
            im_mask[y0:y1, x0:x1] = mask[y0 - y : y1 - y, x0 - x : x1 - x]
        return im_mask

    def compute_dp_iou(self, img_id, cat_id) -> np.ndarray:
        """Mask IoU matrix [D, G] (reference computeDPIoU:379-436)."""
        from scipy.ndimage import zoom as spzoom

        p = self.params
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return np.zeros((0, 0))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[0 : p.maxDets[-1]]

        gtmasks = []
        for g in gt:
            if "dp_masks" in g:
                mask = np.minimum(self.get_densepose_mask(g["dp_masks"]), 1.0)
                _, _, w, h = g["bbox"]
                scale_x = float(max(w, 1)) / mask.shape[1]
                scale_y = float(max(h, 1)) / mask.shape[0]
                mask = spzoom(mask, (scale_y, scale_x), order=1, prefilter=False)
                mask = np.array(mask > 0.5, dtype=np.uint8)
                gtmasks.append(self._rlemask_on_image(mask, img_id, g))
            elif "segmentation" in g and isinstance(g["segmentation"], np.ndarray):
                gtmasks.append(np.asarray(g["segmentation"], np.uint8))
            else:
                gtmasks.append(self._rlemask_on_image(None, img_id, g))

        dtmasks = []
        for d in dt:
            mask = np.asarray(self._extract_mask(d) > 0, np.uint8)
            dtmasks.append(self._rlemask_on_image(mask, img_id, d))

        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        return _mask_iou_crowd(dtmasks, gtmasks, iscrowd)

    # ---------------------------------------------------------------- gps

    def _gps_single_pair(self, dt, gt, py, px, pts_mask) -> Tuple[np.ndarray, np.ndarray]:
        """(reference computeOgps_single_pair + extract_iuv_from_quantized +
        computeOgps_single_pair_iuv:619-687)."""
        iuv = np.asarray(dt["densepose"])
        ipoints = iuv[0, py, px].astype(np.float64)
        upoints = iuv[1, py, px] / 255.0
        vpoints = iuv[2, py, px] / 255.0
        ipoints = np.where(pts_mask == -1, 0, ipoints)
        c_verts_gt_raw, c_verts_gt_t = self.tables.closest_verts_gt(gt)
        c_verts_dt_t = self.tables.closest_verts_uv(upoints, vpoints, ipoints)
        dist = self.tables.distances(c_verts_gt_t, c_verts_dt_t)
        k = self.tables.norm_coeffs(c_verts_gt_raw)
        return dist, k

    def compute_ogps(self, img_id, cat_id) -> Tuple[np.ndarray, np.ndarray]:
        """GPS matrix [D, G] + bbox IoU matrix (reference computeOgps:721-778)."""
        p = self.params
        g = self._gts[img_id, cat_id]
        d = self._dts[img_id, cat_id]
        inds = np.argsort([-d_["score"] for d_ in d], kind="mergesort")
        d = [d[i] for i in inds]
        if len(d) > p.maxDets[-1]:
            d = d[0 : p.maxDets[-1]]
        if len(g) == 0 or len(d) == 0:
            return np.zeros((0, 0)), np.zeros((0, 0))
        ious = np.zeros((len(d), len(g)))
        for j, gt in enumerate(g):
            if gt["ignore"]:
                continue
            g_ = gt["bbox"]
            for i, dt in enumerate(d):
                dy = int(dt["bbox"][3])
                dx = int(dt["bbox"][2])
                dp_x = np.array(gt["dp_x"]) * g_[2] / 255.0
                dp_y = np.array(gt["dp_y"]) * g_[3] / 255.0
                py = (dp_y + g_[1] - dt["bbox"][1]).astype(int)
                px = (dp_x + g_[0] - dt["bbox"][0]).astype(int)
                pts = np.zeros(len(px))
                pts[px >= dx] = -1
                pts[py >= dy] = -1
                pts[px < 0] = -1
                pts[py < 0] = -1
                if len(pts) < 1 or np.max(pts) == -1:
                    ogps = 0.0
                else:
                    px = np.where(pts == -1, 0, px)
                    py = np.where(pts == -1, 0, py)
                    dists, k = self._gps_single_pair(dt, gt, py, px, pts)
                    ogps_values = np.exp(-(dists**2) / (2 * (k**2)))
                    ogps = np.mean(ogps_values) if len(ogps_values) > 0 else 0.0
                ious[i, j] = ogps

        gbb = np.array([gt["bbox"] for gt in g], np.float64)
        dbb = np.array([dt["bbox"] for dt in d], np.float64)
        iscrowd = [int(o.get("iscrowd", 0)) for o in g]
        ious_bb = _bbox_iou_crowd(dbb, gbb, iscrowd)
        return ious, ious_bb

    # ------------------------------------------------------------ evaluate

    def evaluate(self):
        p = self.params
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        p.maxDets = sorted(p.maxDets)
        self._prepare()
        cat_ids = p.catIds if p.useCats else [-1]

        if self.mode in ("gpsm", "iou"):
            self.real_ious = {
                (img_id, cat_id): self.compute_dp_iou(img_id, cat_id)
                for img_id in p.imgIds
                for cat_id in cat_ids
            }
        self.ious = {
            (img_id, cat_id): self.compute_ogps(img_id, cat_id)
            for img_id in p.imgIds
            for cat_id in cat_ids
        }

        self.evalImgs = [
            self.evaluate_img(img_id, cat_id, area_rng, p.maxDets[-1])
            for cat_id in cat_ids
            for area_rng in p.areaRng
            for img_id in p.imgIds
        ]
        import copy

        self._paramsEval = copy.deepcopy(self.params)

    def evaluate_img(self, img_id, cat_id, a_rng, max_det) -> Optional[Dict[str, Any]]:
        """(reference evaluateImg:781-925, replicated exactly — including the
        rescue pass operating at the last threshold index only)."""
        p = self.params
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            if g["ignore"] or (g["area"] < a_rng[0] or g["area"] > a_rng[1]):
                g["_ignore"] = True
            else:
                g["_ignore"] = False

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:max_det]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]

        pair = self.ious[img_id, cat_id]
        ious = pair[0][:, gtind] if len(pair[0]) > 0 else pair[0]
        ioubs = pair[1][:, gtind] if len(pair[1]) > 0 else pair[1]
        if self.mode in ("gpsm", "iou"):
            r = self.real_ious[img_id, cat_id]
            iousM = r[:, gtind] if len(r) > 0 else r

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if np.all(gtIg):
            dtIg = np.logical_or(dtIg, True)

        tind = T - 1  # the reference's loop variable survives the loop
        if len(ious) > 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, _g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if self.mode == "gpsm":
                            new_iou = np.sqrt(iousM[dind, gind] * ious[dind, gind])
                        elif self.mode == "iou":
                            new_iou = iousM[dind, gind]
                        else:
                            new_iou = ious[dind, gind]
                        if new_iou < iou:
                            continue
                        if new_iou == 0.0:
                            continue
                        iou = new_iou
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]

        if not len(ioubs) == 0:
            for dind, d in enumerate(dt):
                if dtm[tind, dind] == 0:
                    ioub = 0.8
                    m = -1
                    for gind, _g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if ioubs[dind, gind] < ioub:
                            continue
                        ioub = ioubs[dind, gind]
                        m = gind
                    if m > -1:
                        dtIg[:, dind] = gtIg[m]
                        if gtIg[m]:
                            dtm[tind, dind] = gt[m]["id"]
                            gtm[tind, m] = d["id"]

        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": img_id,
            "category_id": cat_id,
            "aRng": a_rng,
            "maxDet": max_det,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # ---------------------------------------------------------- accumulate

    def accumulate(self):
        """(reference accumulate:926-1029)."""
        p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds) if p.useCats else 1
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        _pe = self._paramsEval
        cat_ids = _pe.catIds if _pe.useCats else [-1]
        set_k = set(cat_ids)
        set_a = set(map(tuple, _pe.areaRng))
        set_m = set(_pe.maxDets)
        set_i = set(_pe.imgIds)
        k_list = [n for n, k in enumerate(p.catIds) if k in set_k]
        m_list = [m for n, m in enumerate(p.maxDets) if m in set_m]
        a_list = [n for n, a in enumerate(map(tuple, p.areaRng)) if a in set_a]
        i_list = [n for n, i in enumerate(p.imgIds) if i in set_i]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, max_det in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dt_scores = np.concatenate([e["dtScores"][0:max_det] for e in E])
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate([e["dtMatches"][:, 0:max_det] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate([e["dtIgnore"][:, 0:max_det] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "precision": precision,
            "recall": recall,
        }

    # ----------------------------------------------------------- summarize

    def _summarize(self, ap=1, iouThr=None, areaRng="all", maxDets=20) -> float:
        p = self.params
        aind = [i for i, lbl in enumerate(p.areaRngLbl) if lbl == areaRng]
        mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
        if ap == 1:
            s = self.eval["precision"]
            if iouThr is not None:
                t = np.where(np.abs(iouThr - p.iouThrs) < 0.001)[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                t = np.where(np.abs(iouThr - p.iouThrs) < 0.001)[0]
                s = s[t]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        """The UV metric vector (reference _summarizeUvs:1106-1127): AP,
        AP{20,30,40 when thresholds reach that low}, AP50, AP75, APm, APl,
        AR, AR50, AR75, ARm, ARl."""
        max_det = self.params.maxDets[0]
        stats = [self._summarize(1, maxDets=max_det)]
        min_threshold = self.params.iouThrs.min()
        if min_threshold <= 0.201:
            stats += [self._summarize(1, maxDets=max_det, iouThr=0.2)]
        if min_threshold <= 0.301:
            stats += [self._summarize(1, maxDets=max_det, iouThr=0.3)]
        if min_threshold <= 0.401:
            stats += [self._summarize(1, maxDets=max_det, iouThr=0.4)]
        stats += [
            self._summarize(1, maxDets=max_det, iouThr=0.5),
            self._summarize(1, maxDets=max_det, iouThr=0.75),
            self._summarize(1, maxDets=max_det, areaRng="medium"),
            self._summarize(1, maxDets=max_det, areaRng="large"),
            self._summarize(0, maxDets=max_det),
            self._summarize(0, maxDets=max_det, iouThr=0.5),
            self._summarize(0, maxDets=max_det, iouThr=0.75),
            self._summarize(0, maxDets=max_det, areaRng="medium"),
            self._summarize(0, maxDets=max_det, areaRng="large"),
        ]
        self.stats = np.array(stats)
        return self.stats


def densepose_metric_names(min_threshold: float = 0.5) -> List[str]:
    """(reference evaluator.py _get_densepose_metrics)."""
    metrics = ["AP"]
    if min_threshold <= 0.201:
        metrics += ["AP20"]
    if min_threshold <= 0.301:
        metrics += ["AP30"]
    if min_threshold <= 0.401:
        metrics += ["AP40"]
    metrics += ["AP50", "AP75", "APm", "APl", "AR", "AR50", "AR75", "ARm", "ARl"]
    return metrics
