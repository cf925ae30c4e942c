#!/usr/bin/env python
"""Pin COCOevalNP against the REFERENCE detectron2's real C++ COCOeval.

The in-tree fuzz test (tests/test_coco_eval_fuzz.py) originally cross-checked
two implementations written by the same author. This script closes the trust
chain: it compiles the upstream metric code from
/root/reference/detectron2/layers/csrc/cocoeval/cocoeval.cpp (driven exactly
like /root/reference/detectron2/evaluation/fast_eval_api.py drives it) as a
torch CPU extension, runs it on randomized COCO-style datasets, and vendors
the resulting precision/recall/scores arrays into
tests/goldens/cocoeval_reference.npz so the equality check survives in
environments without a C++ toolchain or torch.

IoUs for the oracle are computed by fresh implementations in this file
(bbox IoU with crowd handling; dense-mask IoU from raw binary masks; OKS),
written from the published pycocotools contract — independently of
detectron2_tpu/evaluation/{coco_eval_np,rle}.py — so agreement on the final
curves also pins computeIoU, the RLE codec, and OKS, not just the matcher.

Usage: PYTHONPATH=/root/repo python dev/make_cocoeval_reference_goldens.py
"""

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CSRC = "/root/reference/detectron2/layers/csrc/cocoeval"
OUT = os.path.join(REPO, "tests", "goldens", "cocoeval_reference.npz")


def build_oracle():
    from torch.utils import cpp_extension

    os.environ.setdefault("TORCH_EXTENSIONS_DIR", "/tmp/torch_extensions")
    return cpp_extension.load(
        name="cocoeval_reference_oracle",
        sources=[
            os.path.join(REPO, "dev", "cocoeval_oracle_shim.cpp"),
            os.path.join(REF_CSRC, "cocoeval.cpp"),
        ],
        extra_include_paths=[REF_CSRC],
        verbose=False,
    )


# ---------------------------------------------------------------- fresh IoUs
# Written from the pycocotools maskApi/computeOks spec, NOT from
# detectron2_tpu's implementations — these are the independent side of the
# cross-check.


def iou_bbox(dts, gts, iscrowd):
    """bbox IoU; for crowd gt the denominator is the detection area alone."""
    out = np.zeros((len(dts), len(gts)))
    for j, g in enumerate(gts):
        gx, gy, gw, gh = g
        ga = gw * gh
        for i, d in enumerate(dts):
            dx, dy, dw, dh = d
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + ga - inter
            out[i, j] = inter / union
    return out


def iou_mask(dts, gts, iscrowd):
    """mask IoU on dense binary masks (d, g: [N, H, W] uint8)."""
    out = np.zeros((len(dts), len(gts)))
    for j, g in enumerate(gts):
        ga = g.sum()
        for i, d in enumerate(dts):
            inter = np.logical_and(d, g).sum()
            da = d.sum()
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def oks(dt_anns, gt_anns, sigmas):
    """Object keypoint similarity per the pycocotools computeOks contract."""
    var = (np.asarray(sigmas) * 2) ** 2
    out = np.zeros((len(dt_anns), len(gt_anns)))
    for j, gt in enumerate(gt_anns):
        g = np.asarray(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = int((vg > 0).sum())
        x0, y0, w, h = gt["bbox"]
        for i, dt in enumerate(dt_anns):
            d = np.asarray(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                dx = np.maximum(0, (x0 - w) - xd) + np.maximum(0, xd - (x0 + 2 * w))
                dy = np.maximum(0, (y0 - h) - yd) + np.maximum(0, yd - (y0 + 2 * h))
            e = (dx**2 + dy**2) / var / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            out[i, j] = np.exp(-e).sum() / len(e) if len(e) else 0.0
    return out


def encode_rle_uncompressed(mask):
    """Dense mask -> COCO uncompressed RLE (column-major runs, 0-run first)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    # run-length: counts of alternating 0s/1s, starting with 0s
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": counts}


# ------------------------------------------------------------------ datasets


def gen_bbox_case(seed, n_images=8, n_cats=5, crowd_frac=0.15, ignore_frac=0.0):
    rng = np.random.RandomState(seed)
    images = [{"id": i, "height": 480, "width": 640} for i in range(n_images)]
    categories = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns, aid = [], 1
    for i in range(n_images):
        for _ in range(rng.randint(0, 12)):
            w = float(rng.choice([8, 24, 64, 180])) * (0.5 + rng.rand())
            h = float(rng.choice([8, 24, 64, 180])) * (0.5 + rng.rand())
            x, y = rng.rand() * (640 - w), rng.rand() * (480 - h)
            ann = {
                "id": aid,
                "image_id": i,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "bbox": [x, y, w, h],
                "area": w * h,
                "iscrowd": int(rng.rand() < crowd_frac),
            }
            if ignore_frac and rng.rand() < ignore_frac:
                ann["ignore"] = 1
            anns.append(ann)
            aid += 1
    gt = {"images": images, "annotations": anns, "categories": categories}
    dets = []
    for ann in anns:
        if rng.rand() < 0.25:
            continue
        x, y, w, h = ann["bbox"]
        n = rng.randn(4) * 10.0
        dets.append(
            {
                "image_id": ann["image_id"],
                "category_id": ann["category_id"] if rng.rand() > 0.1 else int(rng.randint(1, n_cats + 1)),
                "bbox": [x + n[0], y + n[1], max(w + n[2], 2.0), max(h + n[3], 2.0)],
                "score": round(float(rng.rand()), 2),  # quantized -> ties
            }
        )
    for img in images:
        for _ in range(rng.randint(0, 4)):
            dets.append(
                {
                    "image_id": img["id"],
                    "category_id": int(rng.randint(1, n_cats + 1)),
                    "bbox": [rng.rand() * 500, rng.rand() * 400, rng.rand() * 100 + 4, rng.rand() * 100 + 4],
                    "score": round(float(rng.rand()), 2),
                }
            )
    return gt, dets


def _blob_mask(rng, H, W):
    """A random filled rectangle + a second overlapping one (multi-run RLE)."""
    m = np.zeros((H, W), np.uint8)
    for _ in range(rng.randint(1, 3)):
        w = int(rng.choice([6, 20, 60, 150]) * (0.5 + rng.rand())) + 2
        h = int(rng.choice([6, 20, 60, 150]) * (0.5 + rng.rand())) + 2
        x, y = rng.randint(0, max(W - w, 1)), rng.randint(0, max(H - h, 1))
        m[y : y + h, x : x + w] = 1
    return m


def gen_segm_case(seed, n_images=5, n_cats=3, crowd_frac=0.15):
    rng = np.random.RandomState(seed)
    H, W = 120, 160  # small frames keep the golden npz tiny
    images = [{"id": i, "height": H, "width": W} for i in range(n_images)]
    categories = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns, aid, gt_masks = [], 1, {}
    for i in range(n_images):
        for _ in range(rng.randint(1, 7)):
            m = _blob_mask(rng, H, W)
            ys, xs = np.nonzero(m)
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(rng.randint(1, n_cats + 1)),
                    "segmentation": encode_rle_uncompressed(m),
                    "bbox": [float(xs.min()), float(ys.min()), float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
                    "area": float(m.sum()),
                    "iscrowd": int(rng.rand() < crowd_frac),
                }
            )
            gt_masks[aid] = m
            aid += 1
    gt = {"images": images, "annotations": anns, "categories": categories}
    dets, det_masks = [], []
    for ann in anns:
        if rng.rand() < 0.2:
            continue
        m = gt_masks[ann["id"]].copy()
        # perturb: shift plus random erosion-ish noise
        sx, sy = rng.randint(-8, 9), rng.randint(-8, 9)
        m = np.roll(np.roll(m, sy, axis=0), sx, axis=1)
        if rng.rand() < 0.5:
            m[:: rng.randint(5, 12)] = 0
        if m.sum() == 0:
            continue
        dets.append(
            {
                "image_id": ann["image_id"],
                "category_id": ann["category_id"] if rng.rand() > 0.1 else int(rng.randint(1, n_cats + 1)),
                "segmentation": encode_rle_uncompressed(m),
                "score": round(float(rng.rand()), 2),
            }
        )
        det_masks.append(m)
    for i in range(n_images):
        m = _blob_mask(rng, H, W)
        dets.append(
            {
                "image_id": i,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "segmentation": encode_rle_uncompressed(m),
                "score": round(float(rng.rand()), 2),
            }
        )
    return gt, dets


def gen_kp_case(seed, n_images=6):
    rng = np.random.RandomState(seed)
    K = 17
    images = [{"id": i, "height": 480, "width": 640} for i in range(n_images)]
    categories = [{"id": 1, "name": "person", "keypoints": [f"k{i}" for i in range(K)], "skeleton": []}]
    anns, aid = [], 1
    for i in range(n_images):
        for _ in range(rng.randint(0, 6)):
            w = float(rng.choice([24, 64, 180])) * (0.5 + rng.rand())
            h = float(rng.choice([24, 64, 180])) * (0.5 + rng.rand())
            x, y = rng.rand() * (640 - w), rng.rand() * (480 - h)
            v = rng.choice([0, 1, 2], size=K, p=[0.2, 0.3, 0.5])
            kp = np.stack([x + rng.rand(K) * w, y + rng.rand(K) * h, v], axis=1)
            kp[v == 0, :2] = 0
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "iscrowd": 0,
                    "keypoints": [float(q) for q in kp.reshape(-1)],
                    "num_keypoints": int((v > 0).sum()),
                }
            )
            aid += 1
    gt = {"images": images, "annotations": anns, "categories": categories}
    dets = []
    for ann in anns:
        for _ in range(rng.randint(0, 26)):  # many dets -> exercises maxDets=20
            g = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
            d = g[:, :2] + rng.randn(K, 2) * rng.choice([2.0, 10.0, 40.0])
            dets.append(
                {
                    "image_id": ann["image_id"],
                    "category_id": 1,
                    "keypoints": [float(q) for xy in d for q in (xy[0], xy[1], 1.0)],
                    "score": round(float(rng.rand()), 2),
                    "bbox": ann["bbox"],
                }
            )
    return gt, dets


# ------------------------------------------------------------ oracle driver

KP_SIGMAS = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


def run_reference(oracle, gt, dets, iou_type, use_cats=1):
    """Drive the reference C++ exactly as fast_eval_api.py does."""
    img_ids = sorted({im["id"] for im in gt["images"]})
    cat_ids = sorted({c["id"] for c in gt["categories"]})
    if iou_type == "keypoints":
        iou_thrs = np.linspace(0.5, 0.95, 10).tolist()
        max_dets = [20]
        area_rng = [[0.0, 1e10], [32.0**2, 96.0**2], [96.0**2, 1e10]]
    else:
        iou_thrs = np.linspace(0.5, 0.95, 10).tolist()
        max_dets = [1, 10, 100]
        area_rng = [[0.0, 1e10], [0.0, 32.0**2], [32.0**2, 96.0**2], [96.0**2, 1e10]]

    # _prepare: per-(img,cat) buckets in insertion order; detection ids are
    # assigned 1..N in result order (loadRes contract); gt ignore |= iscrowd
    # (and, for keypoints, num_keypoints == 0)
    gts, dts = {}, {}
    for ann in gt["annotations"]:
        ig = int(bool(ann.get("ignore", 0) or ann.get("iscrowd", 0)))
        if iou_type == "keypoints":
            ig = int(bool(ig or ann.get("num_keypoints", 0) == 0))
        a = dict(ann, ignore=ig)
        gts.setdefault((ann["image_id"], ann["category_id"]), []).append(a)
    masks = {}
    for did, d in enumerate(dets, 1):
        d = dict(d, id=did)
        if iou_type == "bbox":
            d["area"] = d["bbox"][2] * d["bbox"][3]
        elif iou_type == "segm":
            m = decode_rle(d["segmentation"])
            masks[("d", did)] = m
            d["area"] = float(m.sum())
        else:
            d["area"] = d["bbox"][2] * d["bbox"][3]
        dts.setdefault((d["image_id"], d["category_id"]), []).append(d)
    for a in gt["annotations"]:
        if iou_type == "segm":
            masks[("g", a["id"])] = decode_rle(a["segmentation"])

    def compute_iou(img_id, cat_id):
        g = gts.get((img_id, cat_id), [])
        d = dts.get((img_id, cat_id), [])
        if not g or not d:
            return []
        d = sorted(d, key=lambda x: -x["score"])[: max_dets[-1]]
        crowd = [int(x.get("iscrowd", 0)) for x in g]
        if iou_type == "bbox":
            ious = iou_bbox([x["bbox"] for x in d], [x["bbox"] for x in g], crowd)
        elif iou_type == "segm":
            ious = iou_mask([masks[("d", x["id"])] for x in d], [masks[("g", x["id"])] for x in g], crowd)
        else:
            ious = oks(d, g, KP_SIGMAS)
        return [[float(v) for v in row] for row in ious]

    def to_cpp(instances, is_det):
        return [
            oracle.InstanceAnnotation(
                int(x["id"]),
                float(x["score"]) if is_det else float(x.get("score", 0.0)),
                float(x["area"]),
                bool(x.get("iscrowd", 0)),
                bool(x.get("ignore", 0)),
            )
            for x in instances
        ]

    cats = cat_ids if use_cats else [-1]
    if use_cats:
        gt_inst = [[to_cpp(gts.get((i, c), []), False) for c in cat_ids] for i in img_ids]
        dt_inst = [[to_cpp(dts.get((i, c), []), True) for c in cat_ids] for i in img_ids]
        ious = [[compute_iou(i, c) for c in cat_ids] for i in img_ids]
    else:
        # flatten categories per image (fast_eval_api useCats=0 branch)
        gt_inst = [[to_cpp([o for c in cat_ids for o in gts.get((i, c), [])], False)] for i in img_ids]
        dt_inst = [[to_cpp([o for c in cat_ids for o in dts.get((i, c), [])], True)] for i in img_ids]

        def compute_iou_nocats(img_id):
            g = [o for c in cat_ids for o in gts.get((img_id, c), [])]
            d = [o for c in cat_ids for o in dts.get((img_id, c), [])]
            if not g or not d:
                return []
            d = sorted(d, key=lambda x: -x["score"])[: max_dets[-1]]
            crowd = [int(x.get("iscrowd", 0)) for x in g]
            assert iou_type == "bbox"
            return [[float(v) for v in row] for row in iou_bbox([x["bbox"] for x in d], [x["bbox"] for x in g], crowd)]

        ious = [[compute_iou_nocats(i)] for i in img_ids]

    eval_imgs = oracle.COCOevalEvaluateImages(area_rng, max_dets[-1], iou_thrs, ious, gt_inst, dt_inst)
    params = types.SimpleNamespace(
        iouThrs=iou_thrs,
        recThrs=np.linspace(0.0, 1.0, 101).tolist(),
        maxDets=max_dets,
        areaRng=area_rng,
        useCats=use_cats,
        catIds=cats if use_cats else [-1],
        imgIds=img_ids,
    )
    ev = oracle.COCOevalAccumulate(params, eval_imgs)
    counts = list(ev["counts"])
    precision = np.array(ev["precision"]).reshape(counts)
    recall = np.array(ev["recall"]).reshape(counts[:1] + counts[2:])
    scores = np.array(ev["scores"]).reshape(counts)
    return precision, recall, scores


def decode_rle(rle):
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((w, h)).T  # column-major


# ------------------------------------------------------------------- main


def main():
    sys.path.insert(0, REPO)
    from detectron2_tpu.evaluation.coco_eval_np import COCOStyleDataset, COCOevalNP

    print("building reference C++ oracle ...", flush=True)
    oracle = build_oracle()

    cases = []
    for seed in [0, 1, 2, 3, 4]:
        cases.append((f"bbox_s{seed}", "bbox", 1) + gen_bbox_case(seed))
    cases.append(("bbox_crowdheavy", "bbox", 1) + gen_bbox_case(99, crowd_frac=0.6))
    cases.append(("bbox_ignore", "bbox", 1) + gen_bbox_case(7, ignore_frac=0.3))
    cases.append(("bbox_nocats", "bbox", 0) + gen_bbox_case(11))
    for seed in [0, 1, 2]:
        cases.append((f"segm_s{seed}", "segm", 1) + gen_segm_case(seed))
    for seed in [0, 1]:
        cases.append((f"kp_s{seed}", "keypoints", 1) + gen_kp_case(seed))

    payload = {}
    for name, iou_type, use_cats, gt, dets in cases:
        if not dets:
            raise RuntimeError(f"{name}: degenerate draw (no detections)")
        prec, rec, sco = run_reference(oracle, gt, dets, iou_type, use_cats)

        # sanity: our evaluator must agree right now, before vendoring
        coco_gt = COCOStyleDataset(gt)
        coco_dt = coco_gt.loadRes(dets)
        ev = COCOevalNP(coco_gt, coco_dt, iouType=iou_type)
        ev.params.useCats = use_cats
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        np.testing.assert_allclose(ev.eval["precision"], prec, atol=1e-9, err_msg=name)
        np.testing.assert_allclose(ev.eval["recall"], rec, atol=1e-9, err_msg=name)
        np.testing.assert_allclose(ev.eval["scores"], sco, atol=1e-9, err_msg=name)

        payload[f"{name}/gt"] = np.frombuffer(json.dumps(gt).encode(), np.uint8)
        payload[f"{name}/dt"] = np.frombuffer(json.dumps(dets).encode(), np.uint8)
        payload[f"{name}/meta"] = np.frombuffer(
            json.dumps({"iou_type": iou_type, "use_cats": use_cats}).encode(), np.uint8
        )
        payload[f"{name}/precision"] = prec
        payload[f"{name}/recall"] = rec
        payload[f"{name}/scores"] = sco
        print(f"{name}: OK (precision {prec.shape}, {int((prec > -1).sum())} valid cells)")

    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e3:.0f} kB, {len(cases)} cases)")


if __name__ == "__main__":
    main()
