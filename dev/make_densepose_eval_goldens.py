#!/usr/bin/env python
"""Generate DensePose-evaluation protocol goldens from the REFERENCE
implementation (densepose_coco_evaluation.py), run as a standalone module.

The reference file needs pycocotools + the detectron2/densepose package tree
+ the 1.5 GB SMPL release files; none exist here (zero-egress). This harness
loads it anyway:

- sys.modules is pre-seeded with stub packages: pycocotools.mask backed by
  this repo's RLE codec (itself pinned against the reference's real C++ in
  round 3, commit af66771) operating on raw binary masks, dummy
  detectron2/densepose converter modules (only touched by the raw-tensor dt
  format, which the goldens avoid by feeding QUANTIZED IUV stacks), and a
  minimal COCO-API object;
- _loadGEval is overridden to inject the synthetic mesh tables from
  tests/projects/densepose_eval_synth.py — including a virtual condensed
  geodesic matrix addressed by the reference's own n=27554 index
  arithmetic — so the full GPS path runs without the SMPL downloads.

Both sides (this oracle and tests/projects/test_densepose_eval_oracle.py)
consume the IDENTICAL synthetic scenario; the goldens pin the whole
protocol: point extraction, vertex snapping, geodesic gps, mask/bbox IoU
matrices, greedy matching incl. the rescue pass, accumulate, summarize.

Usage: PYTHONPATH=/root/repo python dev/make_densepose_eval_goldens.py
Writes tests/projects/data/densepose_eval_goldens.json.
"""

import copy
import json
import os
import sys
import types
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "projects"))

REFERENCE_EVAL = "/root/reference/projects/DensePose/densepose/evaluation/densepose_coco_evaluation.py"

from detectron2_tpu.evaluation.rle import polygons_to_mask, rle_to_mask  # noqa: E402

from densepose_eval_synth import (  # noqa: E402
    make_cases,
    make_mesh_tables,
    rasterize_ignore_regions,
)


# --------------------------------------------------------------------- stubs


def _as_mask(obj):
    if isinstance(obj, dict):
        if "mask" in obj:
            return np.asarray(obj["mask"])
        return rle_to_mask(obj)
    return np.asarray(obj)


def _make_maskutils_stub():
    m = types.ModuleType("pycocotools.mask")

    def decode(rle):
        return _as_mask(rle).astype(np.uint8)

    def encode(arr):
        arr = np.asarray(arr)
        if arr.ndim == 3:
            return [{"mask": arr[:, :, c] > 0} for c in range(arr.shape[2])]
        return {"mask": arr > 0}

    def frPyObjects(objs, h, w):
        out = []
        for poly in objs:
            out.append({"mask": polygons_to_mask([np.asarray(poly, np.float64)], h, w) > 0})
        return out

    def merge(rles, intersect=0):
        masks = [_as_mask(r) for r in rles]
        acc = masks[0]
        for mm in masks[1:]:
            acc = np.logical_and(acc, mm) if intersect else np.logical_or(acc, mm)
        return {"mask": acc}

    def area(rle):
        return int(_as_mask(rle).sum())

    def iou(d, g, iscrowd):
        if len(d) == 0 or len(g) == 0:
            return []
        first = d[0]
        if isinstance(first, dict):
            dm = [_as_mask(x) for x in d]
            gm = [_as_mask(x) for x in g]
            out = np.zeros((len(dm), len(gm)))
            for j in range(len(gm)):
                ga = int(gm[j].sum())
                for i in range(len(dm)):
                    assert dm[i].shape == gm[j].shape, (dm[i].shape, gm[j].shape)
                    inter = int(np.logical_and(dm[i], gm[j]).sum())
                    da = int(dm[i].sum())
                    union = da if iscrowd[j] else da + ga - inter
                    out[i, j] = inter / union if union > 0 else 0.0
            return out
        # bbox XYWH
        out = np.zeros((len(d), len(g)))
        for j in range(len(g)):
            gx, gy, gw, gh = g[j]
            for i in range(len(d)):
                dx, dy, dw, dh = d[i]
                iw = min(dx + dw, gx + gw) - max(dx, gx)
                ih = min(dy + dh, gy + gh) - max(dy, gy)
                if iw <= 0 or ih <= 0:
                    continue
                inter = iw * ih
                union = dw * dh if iscrowd[j] else dw * dh + gw * gh - inter
                out[i, j] = inter / union if union > 0 else 0.0
        return out

    m.decode = decode
    m.encode = encode
    m.frPyObjects = frPyObjects
    m.merge = merge
    m.area = area
    m.iou = iou
    return m


def _install_stubs():
    pycoco = types.ModuleType("pycocotools")
    mask_mod = _make_maskutils_stub()
    pycoco.mask = mask_mod
    sys.modules["pycocotools"] = pycoco
    sys.modules["pycocotools.mask"] = mask_mod

    d2 = types.ModuleType("detectron2")
    d2_utils = types.ModuleType("detectron2.utils")
    d2_fio = types.ModuleType("detectron2.utils.file_io")

    class PathManager:
        @staticmethod
        def get_local_path(path, **kw):
            raise RuntimeError("network fetch attempted in oracle harness")

    d2_fio.PathManager = PathManager
    sys.modules["detectron2"] = d2
    sys.modules["detectron2.utils"] = d2_utils
    sys.modules["detectron2.utils.file_io"] = d2_fio

    dp = types.ModuleType("densepose")
    dp_conv = types.ModuleType("densepose.converters")
    dp_c2c = types.ModuleType("densepose.converters.chart_output_to_chart_result")
    dp_s2m = types.ModuleType("densepose.converters.segm_to_mask")

    def _unused(*a, **k):
        raise RuntimeError("raw-tensor dt path exercised; goldens use quantized dts only")

    dp_c2c.resample_uv_tensors_to_bbox = _unused
    dp_s2m.resample_coarse_segm_tensor_to_bbox = _unused
    dp_s2m.resample_fine_and_coarse_segm_tensors_to_bbox = _unused

    dp_cse = types.ModuleType("densepose.modeling.cse.utils")

    def squared_euclidean_distance_matrix(a, b):
        raise RuntimeError("CSE path not exercised by goldens")

    dp_cse.squared_euclidean_distance_matrix = squared_euclidean_distance_matrix

    dp_structs = types.ModuleType("densepose.structures")

    class DensePoseDataRelative:
        S_KEY = "dp_masks"

    dp_structs.DensePoseDataRelative = DensePoseDataRelative
    dp_mesh = types.ModuleType("densepose.structures.mesh")

    def create_mesh(*a, **k):
        raise RuntimeError("CSE mesh path not exercised by goldens")

    dp_mesh.create_mesh = create_mesh

    sys.modules["densepose"] = dp
    sys.modules["densepose.converters"] = dp_conv
    sys.modules["densepose.converters.chart_output_to_chart_result"] = dp_c2c
    sys.modules["densepose.converters.segm_to_mask"] = dp_s2m
    sys.modules["densepose.modeling"] = types.ModuleType("densepose.modeling")
    sys.modules["densepose.modeling.cse"] = types.ModuleType("densepose.modeling.cse")
    sys.modules["densepose.modeling.cse.utils"] = dp_cse
    sys.modules["densepose.structures"] = dp_structs
    sys.modules["densepose.structures.mesh"] = dp_mesh


class _CocoStub:
    """The slice of the pycocotools COCO API the reference evaluator touches."""

    def __init__(self, anns, imgs):
        self._anns = anns
        self.imgs = imgs

    def getImgIds(self):
        return sorted(self.imgs.keys())

    def getCatIds(self):
        return sorted({a["category_id"] for a in self._anns}) or [1]

    def getAnnIds(self, imgIds=None, catIds=None):
        img_set = set(imgIds) if imgIds else None
        cat_set = set(catIds) if catIds else None
        out = []
        for a in self._anns:
            if img_set is not None and a["image_id"] not in img_set:
                continue
            if cat_set is not None and a["category_id"] not in cat_set:
                continue
            out.append(a["id"])
        return out

    def loadAnns(self, ids):
        by_id = {a["id"]: a for a in self._anns}
        return [by_id[i] for i in ids]

    def loadImgs(self, ids):
        return [self.imgs[i] for i in ids]


def main():
    _install_stubs()
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location("ref_dp_eval", REFERENCE_EVAL)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    tables = make_mesh_tables()
    cases = make_cases()

    class OracleEval(ref.DensePoseCocoEval):
        def _loadGEval(self):
            self.Part_UVs = [np.asarray(p) for p in tables["part_uvs"]]
            self.Part_ClosestVertInds = [np.asarray(p) for p in tables["part_vert_inds"]]
            self.PDIST_transform = np.asarray(tables["pdist_transform"])
            self.Pdist_matrix = tables["pdist_matrix"]
            self.Part_ids = np.asarray(tables["part_ids"])
            self.Mean_Distances = np.array(
                [0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150]
            )
            self.CoarseParts = np.array(
                [0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8]
            )

    # image dicts, with the ignore-region polygons split into x/y lists
    # the way the reference expects (ignore_regions_x / ignore_regions_y)
    imgs = {}
    for img_id, (h, w) in cases["image_sizes"].items():
        entry = {"id": img_id, "height": h, "width": w}
        if img_id in cases["ignore_polys"]:
            xs, ys = [], []
            for poly in cases["ignore_polys"][img_id]:
                xs.append([float(v) for v in poly[0::2]])
                ys.append([float(v) for v in poly[1::2]])
            entry["ignore_regions_x"] = xs
            entry["ignore_regions_y"] = ys
        imgs[img_id] = entry

    dts_ref = []
    for d in cases["dts"]:
        d = dict(d)
        iuv = d.pop("densepose_iuv")
        d["densepose"] = SimpleNamespace(labels_uv_uint8=torch.from_numpy(np.ascontiguousarray(iuv)))
        dts_ref.append(d)

    goldens = {"modes": {}}
    for mode_name in ["GPS", "GPSM", "IOU"]:
        coco_gt = _CocoStub(copy.deepcopy(cases["gts"]), imgs)
        coco_dt = _CocoStub(dts_ref, imgs)
        ev = OracleEval(
            coco_gt, coco_dt, "densepose", dpEvalMode=getattr(ref.DensePoseEvalMode, mode_name)
        )
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        gps_matrices = {}
        for (img_id, cat_id), pair in ev.ious.items():
            if isinstance(pair, tuple) and len(pair) == 2 and np.asarray(pair[0]).size:
                gps_matrices[f"{img_id}_{cat_id}"] = np.asarray(pair[0]).round(12).tolist()
        goldens["modes"][mode_name.lower()] = {
            "stats": np.asarray(ev.stats).round(12).tolist(),
            "precision_sum": float(ev.eval["precision"][ev.eval["precision"] > -1].sum()),
            "recall": np.asarray(ev.eval["recall"]).round(12).tolist(),
            "gps": gps_matrices,
        }

    out_path = os.path.join(REPO, "tests", "projects", "data", "densepose_eval_goldens.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote", out_path)
    for mode, g in goldens["modes"].items():
        print(mode, "AP:", g["stats"][0], "AR:", g["stats"][6] if len(g["stats"]) > 6 else None)


if __name__ == "__main__":
    main()
