"""DensePose COCO evaluation with GPS / GPSM metrics
(reference projects/DensePose/densepose/evaluation/densepose_coco_evaluation.py).

GPS (geodesic point similarity) per (detection, gt) pair:
    gps = mean_p exp(-d(p)^2 / (2 k(p)^2))
over the gt's annotated points p, where d(p) is the mesh geodesic distance
between the gt vertex and the vertex predicted at p, and k(p) is the
per-part normalization (Mean_Distances in the reference). GPSM combines GPS
with the mask IoU: gpsm = sqrt(gps * miou). AP/AR are then standard COCOeval
accumulation with GPS(M) as the match-quality matrix.

The reference hard-codes the SMPL mesh files (Pdist_matrix etc., fetched
from the DensePose data release). This environment has no network, so the
mesh geometry is abstracted behind ``MeshDistanceProvider``:
``SmplDistanceProvider`` loads the release files when available, and tests
use a synthetic provider. The evaluation math downstream of the provider is
the reference's.
"""

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

from detectron2_tpu.data import MetadataCatalog
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.utils import comm

__all__ = ["MeshDistanceProvider", "SmplDistanceProvider", "DensePoseCOCOEvaluator"]

logger = logging.getLogger(__name__)


class MeshDistanceProvider:
    """Geodesic machinery for one mesh: vertex lookup + distances +
    per-point normalization coefficients."""

    def closest_vertices(self, part: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        """Map chart (part, u, v) points to mesh vertex indices."""
        raise NotImplementedError

    def distances(self, verts_a: np.ndarray, verts_b: np.ndarray) -> np.ndarray:
        """Pairwise-matched geodesic distances between vertex index arrays."""
        raise NotImplementedError

    def norm_coeffs(self, parts: np.ndarray) -> np.ndarray:
        """Per-point gps normalization k (the reference's Mean_Distances
        indexed by CoarseParts[Part_ids[...]])."""
        raise NotImplementedError


class SmplDistanceProvider(MeshDistanceProvider):
    """The reference's SMPL machinery, loading the DensePose release files
    (SMPL_subdiv.mat, Pdist_matrix.pkl, SMPL_SUBDIV_TRANSFORM.mat) from
    ``data_dir``. Mirrors densepose_coco_evaluation.py:155-230."""

    MEAN_DISTANCES = np.array([0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150])
    COARSE_PARTS = np.array(
        [0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8]
    )

    def __init__(self, data_dir: str):
        import pickle
        import scipy.io as sio

        smpl_subdiv = sio.loadmat(f"{data_dir}/SMPL_subdiv.mat")
        self.part_ids = smpl_subdiv["Part_ID_subdiv"].squeeze()
        self.u_norm = smpl_subdiv["U_subdiv"].squeeze()
        self.v_norm = smpl_subdiv["V_subdiv"].squeeze()
        with open(f"{data_dir}/Pdist_matrix.pkl", "rb") as f:
            self.pdist = pickle.load(f)["Pdist_matrix"].squeeze()
        arrays = sio.loadmat(f"{data_dir}/SMPL_SUBDIV_TRANSFORM.mat")
        self.pdist_transform = arrays["index"].squeeze().astype(np.int32)

    def closest_vertices(self, part, u, v):
        out = np.zeros(len(part), np.int64)
        for i, (p, uu, vv) in enumerate(zip(part, u, v)):
            mask = self.part_ids == p
            if not mask.any():
                continue
            du = self.u_norm[mask] - uu
            dv = self.v_norm[mask] - vv
            out[i] = np.where(mask)[0][np.argmin(du * du + dv * dv)]
        return out

    def _pdist_at(self, i, j):
        lo, hi = min(i, j), max(i, j)
        if lo == hi:
            return 0.0
        idx = hi * (hi - 1) // 2 + lo
        return float(self.pdist[idx])

    def distances(self, verts_a, verts_b):
        va = self.pdist_transform[verts_a.astype(np.int64)]
        vb = self.pdist_transform[verts_b.astype(np.int64)]
        return np.array([self._pdist_at(a, b) for a, b in zip(va, vb)])

    def norm_coeffs(self, parts):
        return self.MEAN_DISTANCES[self.COARSE_PARTS[parts.astype(int)]]


def build_mesh_distance_provider(cfg) -> MeshDistanceProvider:
    """The SMPL provider from the DensePose release files under
    $DETECTRON2_DATASETS/densepose_eval_data (SMPL_subdiv.mat,
    Pdist_matrix.pkl, SMPL_SUBDIV_TRANSFORM.mat — the files the reference
    fetches from dl.fbaipublicfiles.com in densepose_coco_evaluation.py
    _loadGEval). Raises with a download hint when absent (zero-egress
    environments must stage them)."""
    import os

    data_dir = os.path.join(
        os.environ.get("DETECTRON2_DATASETS", "datasets"), "densepose_eval_data"
    )
    if not os.path.exists(os.path.join(data_dir, "SMPL_subdiv.mat")):
        raise FileNotFoundError(
            f"DensePose SMPL evaluation data not found in {data_dir}; download "
            "SMPL_subdiv.mat / Pdist_matrix.pkl / SMPL_SUBDIV_TRANSFORM.mat from "
            "https://dl.fbaipublicfiles.com/densepose/data/ into that directory"
        )
    return SmplDistanceProvider(data_dir)


def _bbox_iou_xywh(d: Sequence[float], g: Sequence[float]) -> float:
    dx1, dy1 = d[0], d[1]
    dx2, dy2 = d[0] + d[2], d[1] + d[3]
    gx1, gy1 = g[0], g[1]
    gx2, gy2 = g[0] + g[2], g[1] + g[3]
    iw = max(0.0, min(dx2, gx2) - max(dx1, gx1))
    ih = max(0.0, min(dy2, gy2) - max(dy1, gy1))
    inter = iw * ih
    union = d[2] * d[3] + g[2] * g[3] - inter
    return inter / union if union > 0 else 0.0


class DensePoseCOCOEvaluator(DatasetEvaluator):
    """AP over GPS / GPSM on DensePose-COCO-format ground truth.

    Ground truth per instance: bbox (XYWH), dp_x/dp_y (point coords in
    255-normalized bbox frame), dp_I/dp_U/dp_V (chart labels). Predictions:
    per-instance IUV maps in the pred-box frame (the chart result of
    DensePoseROIHeads inference).
    """

    def __init__(
        self,
        dataset_name: str,
        mesh_provider: MeshDistanceProvider,
        mode: str = "gps",  # gps | gpsm
        iou_thresholds: Optional[np.ndarray] = None,
        min_iou_threshold: float = 0.5,
    ):
        self._metadata = MetadataCatalog.get(dataset_name)
        self._provider = mesh_provider
        assert mode in ("gps", "gpsm"), mode
        self._mode = mode
        if iou_thresholds is None:
            # (reference evaluation/evaluator.py:341-344): thresholds start
            # at DENSEPOSE_EVALUATION.MIN_IOU_THRESHOLD
            n = int(np.round((0.95 - min_iou_threshold) / 0.05)) + 1
            iou_thresholds = np.linspace(min_iou_threshold, 0.95, n, endpoint=True)
        self._thrs = iou_thresholds
        self._predictions: List[Dict] = []
        self._gts: Dict[int, List[Dict]] = {}

    def reset(self):
        self._predictions = []

    def set_ground_truth(self, gts_by_image: Dict[int, List[Dict]]):
        """Register GT annotations (image_id -> list of instance dicts with
        bbox/dp_x/dp_y/dp_I/dp_U/dp_V). In a full data pipeline this comes
        from the dataset json; exposed for direct use and tests."""
        self._gts = gts_by_image

    def process(self, inputs, outputs):
        """outputs: per-image dicts with 'image_id', 'instances' list of
        {bbox XYWH, score, densepose [M, M, 3] (part, u, v)}."""
        for out in outputs:
            self._predictions.append(out)

    def _gps_single(self, dt: Dict, gt: Dict) -> float:
        g_bbox = gt["bbox"]
        d_bbox = dt["bbox"]
        dp_x = np.asarray(gt["dp_x"], np.float64) * g_bbox[2] / 255.0
        dp_y = np.asarray(gt["dp_y"], np.float64) * g_bbox[3] / 255.0
        px = (dp_x + g_bbox[0] - d_bbox[0]).astype(int)
        py = (dp_y + g_bbox[1] - d_bbox[1]).astype(int)
        ok = (px >= 0) & (py >= 0) & (px < int(d_bbox[2])) & (py < int(d_bbox[3]))
        if len(px) == 0 or not ok.any():
            return 0.0

        iuv = np.asarray(dt["densepose"])  # [M, M, 3]
        M = iuv.shape[0]
        # map points in the det box to the M x M grid
        gx = np.clip((px * M / max(d_bbox[2], 1e-6)).astype(int), 0, M - 1)
        gy = np.clip((py * M / max(d_bbox[3], 1e-6)).astype(int), 0, M - 1)
        pred_part = iuv[gy, gx, 0].astype(int)
        pred_u = iuv[gy, gx, 1]
        pred_v = iuv[gy, gx, 2]

        gt_verts = self._provider.closest_vertices(
            np.asarray(gt["dp_I"], int), np.asarray(gt["dp_U"]), np.asarray(gt["dp_V"])
        )
        dt_verts = self._provider.closest_vertices(pred_part, pred_u, pred_v)
        dist = self._provider.distances(gt_verts, dt_verts)
        dist = np.where(ok, dist, np.inf)  # out-of-box points contribute 0
        k = self._provider.norm_coeffs(np.asarray(gt["dp_I"], int))
        gps_vals = np.exp(-(dist**2) / (2.0 * k**2))
        return float(np.mean(gps_vals))

    def evaluate(self):
        comm.synchronize()
        preds = comm.gather(self._predictions)
        if not comm.is_main_process():
            return
        preds = list(itertools.chain(*preds))

        # per-image greedy matching at each threshold (COCOeval semantics)
        n_thr = len(self._thrs)
        scores_all, matched_all = [], []
        n_gt = 0
        for out in preds:
            gts = self._gts.get(out["image_id"], [])
            n_gt += len(gts)
            dts = sorted(out["instances"], key=lambda d: -d["score"])
            sim = np.zeros((len(dts), len(gts)))
            for i, dt in enumerate(dts):
                for j, gt in enumerate(gts):
                    s = self._gps_single(dt, gt)
                    if self._mode == "gpsm":
                        miou = _bbox_iou_xywh(dt["bbox"], gt["bbox"])
                        s = float(np.sqrt(max(s, 0.0) * max(miou, 0.0)))
                    sim[i, j] = s
            for i, dt in enumerate(dts):
                scores_all.append(dt["score"])
                row = np.zeros(n_thr, bool)
                matched_all.append(row)
            # greedy match per threshold
            for t_i, thr in enumerate(self._thrs):
                taken = set()
                base = len(scores_all) - len(dts)
                for i in range(len(dts)):
                    best_j, best_s = -1, thr
                    for j in range(len(gts)):
                        if j in taken:
                            continue
                        if sim[i, j] >= best_s:
                            best_j, best_s = j, sim[i, j]
                    if best_j >= 0:
                        taken.add(best_j)
                        matched_all[base + i][t_i] = True

        if not scores_all or n_gt == 0:
            return OrderedDict({"densepose": {"AP": float("nan")}})

        order = np.argsort(-np.asarray(scores_all), kind="stable")
        matched = np.stack(matched_all)[order]  # [D, T]
        aps = []
        for t_i in range(n_thr):
            tp = np.cumsum(matched[:, t_i])
            fp = np.cumsum(~matched[:, t_i])
            rec = tp / n_gt
            prec = tp / np.maximum(tp + fp, 1)
            # 101-point interpolated AP (COCO protocol)
            rc_thrs = np.linspace(0, 1, 101)
            prec_interp = np.maximum.accumulate(prec[::-1])[::-1]
            idx = np.searchsorted(rec, rc_thrs, side="left")
            ap = np.mean([prec_interp[k] if k < len(prec_interp) else 0.0 for k in idx])
            aps.append(ap)

        name = "AP" if self._mode == "gps" else "AP-GPSm"
        res = {
            name: 100.0 * float(np.mean(aps)),
            f"{name}50": 100.0 * float(aps[0]),
            f"{name}75": 100.0 * float(aps[5]),
        }
        results = OrderedDict({"densepose": res})
        logger.info(results)
        return results
