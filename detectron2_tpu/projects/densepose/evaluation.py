"""DensePose COCO evaluation: GPS / GPSM / IOU metrics + mesh alignment
(reference projects/DensePose/densepose/evaluation/{evaluator.py,
densepose_coco_evaluation.py,mesh_alignment_evaluator.py}).

The protocol itself lives in :mod:`.dp_coco_eval`
(``DensePoseCocoEvalEngine``), a numpy re-implementation of the reference's
full COCOeval variant pinned bit-for-bit against the reference file through
the synthetic-mesh oracle goldens (tests/projects/test_densepose_eval_oracle.py).
This module provides the DatasetEvaluator wrapper
(``DensePoseCOCOEvaluator``: prediction normalization, gather, the three
densepose_gps/gpsm/segm result sections), the SMPL release-file loaders
(``load_smpl_mesh_tables`` for the engine; the legacy
``MeshDistanceProvider``/``SmplDistanceProvider`` pair for direct geodesic
queries), and the CSE ``MeshAlignmentEvaluator``.

The reference fetches SMPL_subdiv.mat / Pdist_matrix.pkl /
SMPL_SUBDIV_TRANSFORM.mat from the DensePose data release; zero-egress
environments stage them under $DETECTRON2_DATASETS/densepose_eval_data.
"""

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

from detectron2_tpu.data import MetadataCatalog
from detectron2_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_tpu.utils import comm

__all__ = [
    "MeshDistanceProvider",
    "SmplDistanceProvider",
    "DensePoseCOCOEvaluator",
    "MeshAlignmentEvaluator",
    "load_smpl_mesh_tables",
]

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


def _smpl_data_dir() -> str:
    import os

    return os.path.join(os.environ.get("DETECTRON2_DATASETS", "datasets"), "densepose_eval_data")


def _require_smpl_files(data_dir: str):
    import os

    if not os.path.exists(os.path.join(data_dir, "SMPL_subdiv.mat")):
        raise FileNotFoundError(
            f"DensePose SMPL evaluation data not found in {data_dir}; download "
            "SMPL_subdiv.mat / Pdist_matrix.pkl / SMPL_SUBDIV_TRANSFORM.mat from "
            "https://dl.fbaipublicfiles.com/densepose/data/ into that directory"
        )


def build_mesh_distance_provider(cfg) -> MeshDistanceProvider:
    """The SMPL provider from the DensePose release files under
    $DETECTRON2_DATASETS/densepose_eval_data (SMPL_subdiv.mat,
    Pdist_matrix.pkl, SMPL_SUBDIV_TRANSFORM.mat — the files the reference
    fetches from dl.fbaipublicfiles.com in densepose_coco_evaluation.py
    _loadGEval). Raises with a download hint when absent (zero-egress
    environments must stage them)."""
    data_dir = _smpl_data_dir()
    _require_smpl_files(data_dir)
    return SmplDistanceProvider(data_dir)


def load_smpl_mesh_tables(data_dir: Optional[str] = None):
    """Build :class:`GeodesicMeshTables` from the DensePose SMPL release
    files, mirroring the reference's _loadGEval
    (densepose_coco_evaluation.py:150-187): per-part UV tables and 1-based
    vertex ids from SMPL_subdiv.mat's Part_ID_subdiv grouping, the raw->
    reduced index from SMPL_SUBDIV_TRANSFORM.mat, and the condensed geodesic
    matrix from Pdist_matrix.pkl."""
    import pickle

    import scipy.io as sio

    from .dp_coco_eval import GeodesicMeshTables

    data_dir = data_dir or _smpl_data_dir()
    _require_smpl_files(data_dir)
    smpl_subdiv = sio.loadmat(f"{data_dir}/SMPL_subdiv.mat")
    part_id = smpl_subdiv["Part_ID_subdiv"].squeeze()
    uv = np.array([smpl_subdiv["U_subdiv"], smpl_subdiv["V_subdiv"]]).squeeze()
    vert_inds = np.arange(uv.shape[1]) + 1
    part_uvs = [uv[:, part_id == (i + 1)] for i in range(24)]
    part_vert_inds = [vert_inds[part_id == (i + 1)] for i in range(24)]
    pdist_transform = sio.loadmat(f"{data_dir}/SMPL_SUBDIV_TRANSFORM.mat")["index"].squeeze()
    with open(f"{data_dir}/Pdist_matrix.pkl", "rb") as f:
        pdist_matrix = pickle.load(f, encoding="latin1")["Pdist_matrix"]
    return GeodesicMeshTables(
        part_uvs=part_uvs,
        part_vert_inds=part_vert_inds,
        pdist_transform=pdist_transform,
        part_ids=part_id,
        pdist_matrix=pdist_matrix,
    )


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
    """The reference's DensePose evaluation (evaluation/evaluator.py:44-163):
    runs the full DensePose COCOeval protocol (:mod:`.dp_coco_eval`) in the
    GPS, GPSM and IOU match-quality modes and reports the UV metric vector
    for each as ``densepose_gps`` / ``densepose_gpsm`` / ``densepose_segm``.

    Ground truth per instance: bbox (XYWH), dp_x/dp_y (point coords in
    255-normalized bbox frame), dp_I/dp_U/dp_V (chart labels), optional
    dp_masks (<=14 per-part 256x256 RLEs). Predictions per instance: bbox
    XYWH, score, and ``densepose`` as either a quantized [3, h, w] IUV stack
    in the int-truncated box frame (DensePoseChartResultQuantized /
    raw ndarray — the reference's results format) or an [M, M, 3] float
    (part, u, v) grid (this repo's fixed-shape chart inference output),
    which is resampled to the box frame and quantized in ``process``.
    """

    def __init__(
        self,
        dataset_name: str,
        tables,  # GeodesicMeshTables
        mode: str = "all",  # gps | gpsm | iou | all
        min_iou_threshold: float = 0.5,
        max_dets: int = 20,
        storage=None,  # BlobSpool from build_densepose_evaluator_storage()
    ):
        from .dp_coco_eval import GeodesicMeshTables

        self._metadata = MetadataCatalog.get(dataset_name)
        assert isinstance(tables, GeodesicMeshTables), (
            "DensePoseCOCOEvaluator now runs the full reference protocol and "
            "needs GeodesicMeshTables (load_smpl_mesh_tables() for the SMPL "
            f"release files); got {type(tables)}"
        )
        self._tables = tables
        assert mode in ("gps", "gpsm", "iou", "all"), mode
        self._mode = mode
        self._min_thr = float(min_iou_threshold)
        self._max_dets = int(max_dets)
        self._storage = storage
        self._predictions: List[Dict] = []
        self._gts: Dict[int, List[Dict]] = {}
        self._image_sizes: Dict[int, tuple] = {}
        self._ignore_regions: Dict[int, np.ndarray] = {}

    def reset(self):
        self._predictions = []

    def set_ground_truth(
        self,
        gts_by_image: Dict[int, List[Dict]],
        image_sizes: Optional[Dict[int, tuple]] = None,
        ignore_regions: Optional[Dict[int, np.ndarray]] = None,
    ):
        """Register GT annotations (image_id -> list of instance dicts with
        bbox/dp_x/dp_y/dp_I/dp_U/dp_V[/dp_masks]). In a full data pipeline
        this comes from the dataset json; exposed for direct use and tests.
        ``image_sizes``: image_id -> (height, width); needed for the GPSM /
        IOU canvas-mask modes (defaults to bounding the boxes).
        ``ignore_regions``: image_id -> binary canvas mask (the rasterized
        ignore_regions_x/y polygons from the dataset json image dicts)."""
        self._gts = gts_by_image
        if image_sizes:
            self._image_sizes.update(image_sizes)
        self._ignore_regions = dict(ignore_regions or {})

    def process(self, inputs, outputs):
        """outputs: per-image dicts with 'image_id', optional 'height'/
        'width', and 'instances': list of {bbox XYWH, score, densepose}."""
        for inp, out in zip(inputs or [{}] * len(outputs), outputs):
            rec = {
                "image_id": out["image_id"],
                "instances": [
                    {**d, "densepose": self._spooled(self._to_quantized(d))}
                    for d in out["instances"]
                ],
            }
            for src in (out, inp or {}):
                if "height" in src and "width" in src:
                    self._image_sizes[out["image_id"]] = (src["height"], src["width"])
                    break
            self._predictions.append(rec)

    def _spooled(self, arr: np.ndarray):
        """With a storage spool, keep only a BlobRef in the predictions list
        (the array lives in the per-rank spool; rank 0 reads it back lazily
        during evaluate) — the memory-bounding path the reference implements
        with its tensor_storage (DENSEPOSE_EVALUATION.STORAGE)."""
        if self._storage is None:
            return arr
        return self._storage.put(arr)

    @staticmethod
    def _to_quantized(dt: Dict) -> np.ndarray:
        """Normalize a prediction's densepose payload to the quantized
        [3, h, w] uint8 stack in the int-truncated box frame."""
        dp = dt["densepose"]
        if hasattr(dp, "labels_uv_uint8"):  # DensePoseChartResultQuantized
            return np.asarray(dp.labels_uv_uint8)
        dp = np.asarray(dp)
        if dp.ndim == 3 and dp.shape[0] == 3:  # already a quantized stack
            return dp.astype(np.uint8)
        # [M, M, 3] float (part, u, v) grid -> resample to the box frame
        assert dp.ndim == 3 and dp.shape[2] == 3, dp.shape
        from scipy.ndimage import zoom as spzoom

        h = max(int(dt["bbox"][3]), 1)
        w = max(int(dt["bbox"][2]), 1)
        zy, zx = h / dp.shape[0], w / dp.shape[1]
        labels = spzoom(dp[..., 0], (zy, zx), order=0, prefilter=False)
        u = spzoom(dp[..., 1], (zy, zx), order=1, prefilter=False)
        v = spzoom(dp[..., 2], (zy, zx), order=1, prefilter=False)
        return np.stack(
            [
                labels.astype(np.uint8),
                (np.clip(u, 0.0, 1.0) * 255).astype(np.uint8),
                (np.clip(v, 0.0, 1.0) * 255).astype(np.uint8),
            ]
        )

    def _assemble(self):
        """Flatten registered gts/preds into the engine's COCO-shaped lists."""
        gts, dts = [], []
        gid = did = 1
        image_sizes = dict(self._image_sizes)
        for img_id, recs in self._gts.items():
            for r in recs:
                g = dict(r)
                g.setdefault("id", gid)
                g.setdefault("image_id", img_id)
                g.setdefault("category_id", 1)
                g.setdefault("area", g["bbox"][2] * g["bbox"][3])
                gts.append(g)
                gid += 1
        for out in self._predictions:
            img_id = out["image_id"]
            for d in out["instances"]:
                d = dict(d)
                d.setdefault("id", did)
                d.setdefault("image_id", img_id)
                d.setdefault("category_id", 1)
                d.setdefault("area", d["bbox"][2] * d["bbox"][3])
                dts.append(d)
                did += 1
        for ann in itertools.chain(gts, dts):
            img_id = ann["image_id"]
            x, y, w, h = ann["bbox"]
            need = (int(np.ceil(y + h)) + 1, int(np.ceil(x + w)) + 1)
            if img_id not in image_sizes:
                image_sizes[img_id] = need
            else:
                cur = image_sizes[img_id]
                image_sizes[img_id] = (max(cur[0], need[0]), max(cur[1], need[1]))
        return gts, dts, image_sizes

    def evaluate(self):
        from .dp_coco_eval import (
            DensePoseCocoEvalEngine,
            DensePoseEvalParams,
            densepose_metric_names,
        )

        comm.synchronize()
        if self._storage is not None:
            # collective: every rank contributes its spool before rank 0 reads
            self._storage.finalize_for_read()
        preds = comm.gather(self._predictions)
        if not comm.is_main_process():
            return
        self._predictions = list(itertools.chain(*preds))
        gts, dts, image_sizes = self._assemble()
        if self._storage is not None:
            from .tensor_storage import BlobRef, LazyBlob

            for d in dts:
                if isinstance(d.get("densepose"), BlobRef):
                    d["densepose"] = LazyBlob(self._storage, d["densepose"])
        if not gts:
            return OrderedDict({"densepose_gps": {"AP": float("nan")}})

        n = int(np.round((0.95 - self._min_thr) / 0.05)) + 1
        modes = ("gps", "gpsm", "iou") if self._mode == "all" else (self._mode,)
        section = {"gps": "densepose_gps", "gpsm": "densepose_gpsm", "iou": "densepose_segm"}
        names = densepose_metric_names(self._min_thr)
        results: "OrderedDict[str, Dict[str, float]]" = OrderedDict()
        for mode in modes:
            params = DensePoseEvalParams(
                iou_thrs=np.linspace(self._min_thr, 0.95, n, endpoint=True)
            )
            params.maxDets = [self._max_dets]
            engine = DensePoseCocoEvalEngine(
                gts=[dict(g) for g in gts],
                dts=dts,
                image_sizes=image_sizes,
                tables=self._tables,
                dp_eval_mode=mode,
                params=params,
                ignore_regions=self._ignore_regions or None,
            )
            engine.evaluate()
            engine.accumulate()
            stats = engine.summarize()
            results[section[mode]] = {
                name: float(v) * 100.0 for name, v in zip(names, stats)
            }
        logger.info(results)
        return results


class MeshAlignmentEvaluator:
    """3D mesh-alignment evaluation for CSE vertex embeddings (reference
    projects/DensePose/densepose/evaluation/mesh_alignment_evaluator.py:16-68).

    For every ordered mesh pair (m1, m2): each of m1's named key vertices is
    matched to its most-similar vertex on m2 (inner product of the learned
    embeddings); the geodesic distance on m2 between the match and m2's
    correspondingly-named key vertex scores the alignment, both raw (GE) and
    as gps = exp(-d^2 / (2 * 0.255^2)) (GPS). Means are per-mesh then global.

    ``embedder``: mesh_name -> [V, D] numpy/jax embedding table (the CSE
    Embedder apply, or any callable in tests). ``mesh_keyvertices``:
    mesh_name -> {keyvertex_name: vertex_id}; defaults to loading the
    reference's mesh_keyvertices_v0.json from the DensePose release staged
    under $DETECTRON2_DATASETS/densepose_meshes (zero-egress: the reference
    fetches it from dl.fbaipublicfiles.com). ``mesh_loader``: mesh_name ->
    object with .geodists [V, V] (defaults to meshes.create_mesh).
    """

    GPS_NORM = 0.255  # the reference's Current_Mean_Distances

    def __init__(self, embedder, mesh_names=None, mesh_keyvertices=None, mesh_loader=None):
        self.embedder = embedder
        self.mesh_names = mesh_names if mesh_names else embedder.mesh_names
        if mesh_keyvertices is None:
            import json
            import os

            path = os.path.join(
                os.environ.get("DETECTRON2_DATASETS", "datasets"),
                "densepose_meshes",
                "mesh_keyvertices_v0.json",
            )
            with open(path) as f:
                mesh_keyvertices = json.load(f)
        self.mesh_keyvertices = mesh_keyvertices
        if mesh_loader is None:
            from .meshes import create_mesh as mesh_loader
        self.mesh_loader = mesh_loader

    def evaluate(self):
        ge_per_mesh, gps_per_mesh = {}, {}
        for mesh_name_1 in self.mesh_names:
            avg_errors, avg_gps = [], []
            embeddings_1 = np.asarray(self.embedder(mesh_name_1))
            keyvertices_1 = self.mesh_keyvertices[mesh_name_1]
            keyvertex_names_1 = list(keyvertices_1.keys())
            keyvertex_indices_1 = [keyvertices_1[name] for name in keyvertex_names_1]
            for mesh_name_2 in self.mesh_names:
                if mesh_name_1 == mesh_name_2:
                    continue
                embeddings_2 = np.asarray(self.embedder(mesh_name_2))
                sim_12 = embeddings_1[keyvertex_indices_1] @ embeddings_2.T
                matches_on_2 = sim_12.argmax(axis=1)
                keyvertices_2 = self.mesh_keyvertices[mesh_name_2]
                geodists = np.asarray(self.mesh_loader(mesh_name_2).geodists)[
                    matches_on_2, [keyvertices_2[name] for name in keyvertex_names_1]
                ]
                gps = np.exp(-(geodists**2) / (2 * self.GPS_NORM**2))
                avg_errors.append(float(geodists.mean()))
                avg_gps.append(float(gps.mean()))
            ge_per_mesh[mesh_name_1] = float(np.mean(avg_errors)) if avg_errors else float("nan")
            gps_per_mesh[mesh_name_1] = float(np.mean(avg_gps)) if avg_gps else float("nan")
        ge_mean_global = float(np.mean(list(ge_per_mesh.values())))
        gps_mean_global = float(np.mean(list(gps_per_mesh.values())))
        return ge_mean_global, gps_mean_global, {"GE": ge_per_mesh, "GPS": gps_per_mesh}
