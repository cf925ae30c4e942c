"""Shared synthetic data for the DensePose evaluation oracle pin.

Used by BOTH dev/make_densepose_eval_goldens.py (which feeds the reference's
densepose_coco_evaluation.py, run as a stubbed standalone module with these
tables injected in place of the SMPL release files) and
tests/projects/test_densepose_eval_oracle.py (which feeds this repo's
DensePoseCocoEvalEngine) — identical construction on both sides is what
makes the golden comparison meaningful.

The mesh is synthetic: 24 chart parts x 5 vertices with random UV tables, a
random raw->reduced vertex transform into the reference's hardcoded
n=27554 index space, and a *virtual* condensed geodesic matrix (a
deterministic hash of the condensed index k -> distance) standing in for
the 1.5 GB Pdist_matrix.pkl the reference downloads.
"""

from typing import Any, Dict, List, Tuple

import numpy as np

N_PARTS = 24
VERTS_PER_PART = 5
N_RAW = N_PARTS * VERTS_PER_PART
N_REDUCED = 27554  # the reference hardcodes this in getDistancesUV


class VirtualPdist:
    """Condensed geodesic 'matrix': index k -> deterministic pseudo-distance
    in [0, 0.5). Supports the reference's `Pdist_matrix[int(k)][0]` access
    and this repo's `.reshape(-1)[0]` on the same value."""

    def __getitem__(self, k: int) -> np.ndarray:
        v = ((int(k) * 2654435761) % (2**32)) % 1000 / 1000.0 * 0.5
        return np.array([v])


def make_mesh_tables(seed: int = 11) -> Dict[str, Any]:
    rng = np.random.RandomState(seed)
    part_uvs: List[np.ndarray] = []
    part_vert_inds: List[np.ndarray] = []
    part_ids = np.zeros(N_RAW, np.int64)
    next_id = 1
    for p in range(N_PARTS):
        inds = np.arange(next_id, next_id + VERTS_PER_PART)
        next_id += VERTS_PER_PART
        part_vert_inds.append(inds)
        part_uvs.append(rng.rand(2, VERTS_PER_PART))
        part_ids[inds - 1] = p + 1
    # raw -> reduced: random distinct ids in [1, N_REDUCED]
    pdist_transform = rng.choice(np.arange(1, N_REDUCED + 1), size=N_RAW, replace=False).astype(
        np.int64
    )
    return {
        "part_uvs": part_uvs,
        "part_vert_inds": part_vert_inds,
        "part_ids": part_ids,
        "pdist_transform": pdist_transform,
        "pdist_matrix": VirtualPdist(),
        "n_reduced": N_REDUCED,
    }


def _rand_box(rng, im_h, im_w, min_size=12, max_size=48) -> List[float]:
    w = float(rng.randint(min_size, max_size))
    h = float(rng.randint(min_size, max_size))
    x = float(rng.randint(0, max(int(im_w - w), 1)))
    y = float(rng.randint(0, max(int(im_h - h), 1)))
    return [x, y, w, h]


def _rand_dp_masks(rng) -> List[Any]:
    """<=14 per-part RLE dicts at 256x256 (COCO uncompressed counts format,
    decoded identically by pycocotools and this repo's rle_to_mask)."""
    from detectron2_tpu.evaluation.rle import mask_to_rle

    polys: List[Any] = []
    n_parts = int(rng.randint(1, 4))
    for i in range(14):
        if i < n_parts:
            m = np.zeros((256, 256), np.uint8)
            x0, y0 = rng.randint(0, 200, size=2)
            m[y0 : y0 + rng.randint(20, 56), x0 : x0 + rng.randint(20, 56)] = 1
            rle = mask_to_rle(m)
            polys.append(rle)
        else:
            polys.append(None)
    return polys


def _zoomed_gt_mask(gt: Dict[str, Any], h: int, w: int) -> np.ndarray:
    """gt dp_masks (labeled 256x256) -> binary (h, w) box-frame mask, the
    same zoom the reference's computeDPIoU applies to gt masks."""
    from scipy.ndimage import zoom as spzoom

    from detectron2_tpu.evaluation.rle import rle_to_mask

    mask = np.zeros([256, 256])
    for i in range(1, min(len(gt["dp_masks"]) + 1, 15)):
        if gt["dp_masks"][i - 1]:
            mask[rle_to_mask(gt["dp_masks"][i - 1]) > 0] = i
    mask = np.minimum(mask, 1.0)
    mask = spzoom(mask, (h / 256.0, w / 256.0), order=1, prefilter=False)
    return np.array(mask > 0.5, dtype=np.uint8)


def paint_dt_iuv(gt: Dict[str, Any], dt_bbox: List[float]) -> np.ndarray:
    """Build a quantized [3, h, w] IUV stack for a detection box that
    reproduces the gt: foreground labels follow the gt's (zoomed) coarse
    mask, and the pixels the protocol will read gt points from carry the
    gt's exact I and quantized U/V — so GPS for this pair is ~1 when the
    boxes coincide and degrades smoothly as the box drifts."""
    h, w = int(dt_bbox[3]), int(dt_bbox[2])
    labels = _zoomed_gt_mask(gt, h, w)  # fg = 1
    u8 = np.zeros((h, w), np.uint8)
    v8 = np.zeros((h, w), np.uint8)
    g = gt["bbox"]
    px = (np.array(gt["dp_x"]) * g[2] / 255.0 + g[0] - dt_bbox[0]).astype(int)
    py = (np.array(gt["dp_y"]) * g[3] / 255.0 + g[1] - dt_bbox[1]).astype(int)
    for k in range(len(px)):
        x, y = px[k], py[k]
        if 0 <= x < w and 0 <= y < h:
            labels[y, x] = int(gt["dp_I"][k])
            u8[y, x] = np.uint8(min(255, round(gt["dp_U"][k] * 255.0)))
            v8[y, x] = np.uint8(min(255, round(gt["dp_V"][k] * 255.0)))
    return np.stack([labels.astype(np.uint8), u8, v8])


def make_cases(seed: int = 5) -> Dict[str, Any]:
    """A fuzz scenario: several images, gts (some crowd, some without dp
    data -> ignored), dts with quantized IUV stacks, one image with an
    ignore-region polygon. Detections are a mix of exact matches (gps ~1,
    exercising the high-threshold bands of the matching + accumulate
    paths), jittered matches (mid-range gps/mask-IoU, exercising threshold
    cutoffs and the bbox-rescue pass), and pure-noise boxes (fps)."""
    rng = np.random.RandomState(seed)
    image_sizes: Dict[int, Tuple[int, int]] = {}
    gts: List[Dict[str, Any]] = []
    dts: List[Dict[str, Any]] = []
    ignore_polys: Dict[int, List[List[float]]] = {}

    gid = did = 1
    for img_id in range(1, 5):
        im_h, im_w = int(rng.randint(128, 192)), int(rng.randint(128, 192))
        image_sizes[img_id] = (im_h, im_w)
        img_gts = []
        for _ in range(int(rng.randint(1, 4))):
            bbox = _rand_box(rng, im_h, im_w, min_size=16, max_size=110)
            gt: Dict[str, Any] = {
                "id": gid,
                "image_id": img_id,
                "category_id": 1,
                "bbox": bbox,
                "area": bbox[2] * bbox[3],
                "iscrowd": int(rng.rand() < 0.15),
            }
            if rng.rand() < 0.85:  # some gts lack dp data -> ignore rule
                n_pts = int(rng.randint(3, 12))
                gt["dp_x"] = (rng.rand(n_pts) * 255).tolist()
                gt["dp_y"] = (rng.rand(n_pts) * 255).tolist()
                gt["dp_I"] = rng.randint(1, 25, size=n_pts).tolist()
                gt["dp_U"] = rng.rand(n_pts).tolist()
                gt["dp_V"] = rng.rand(n_pts).tolist()
                gt["dp_masks"] = _rand_dp_masks(rng)
            gts.append(gt)
            img_gts.append(gt)
            gid += 1
        # matched + jittered detections against the dp-annotated gts
        for gt in img_gts:
            if "dp_x" not in gt:
                continue
            if rng.rand() < 0.8:  # exact-box match
                bbox = [float(v) for v in gt["bbox"]]
                dts.append(
                    {
                        "id": did,
                        "image_id": img_id,
                        "category_id": 1,
                        "bbox": bbox,
                        "area": bbox[2] * bbox[3],
                        "score": float(np.round(0.6 + 0.4 * rng.rand(), 3)),
                        "densepose_iuv": paint_dt_iuv(gt, bbox),
                    }
                )
                did += 1
            if rng.rand() < 0.6:  # jittered box: mid-range gps / mask IoU
                g = gt["bbox"]
                dx = float(rng.randint(-6, 7))
                dy = float(rng.randint(-6, 7))
                sw = float(np.clip(g[2] * (0.8 + 0.4 * rng.rand()), 8, im_w))
                sh = float(np.clip(g[3] * (0.8 + 0.4 * rng.rand()), 8, im_h))
                bbox = [
                    float(np.clip(g[0] + dx, 0, im_w - 8)),
                    float(np.clip(g[1] + dy, 0, im_h - 8)),
                    sw,
                    sh,
                ]
                dts.append(
                    {
                        "id": did,
                        "image_id": img_id,
                        "category_id": 1,
                        "bbox": bbox,
                        "area": bbox[2] * bbox[3],
                        "score": float(np.round(0.3 + 0.5 * rng.rand(), 3)),
                        "densepose_iuv": paint_dt_iuv(gt, bbox),
                    }
                )
                did += 1
        for _ in range(int(rng.randint(1, 5))):
            bbox = _rand_box(rng, im_h, im_w)
            h, w = int(bbox[3]), int(bbox[2])
            labels = rng.randint(0, 25, size=(h, w)).astype(np.uint8)
            u8 = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            v8 = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            dts.append(
                {
                    "id": did,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": bbox,
                    "area": bbox[2] * bbox[3],
                    "score": float(np.round(rng.rand(), 3)),
                    "densepose_iuv": np.stack([labels, u8, v8]),  # [3, h, w]
                }
            )
            did += 1
    # one image gets an ignore-region rectangle polygon
    ir_img = 2
    h, w = image_sizes[ir_img]
    ignore_polys[ir_img] = [[2.0, 2.0, w * 0.6, 2.0, w * 0.6, h * 0.6, 2.0, h * 0.6]]
    return {
        "image_sizes": image_sizes,
        "gts": gts,
        "dts": dts,
        "ignore_polys": ignore_polys,
    }


def rasterize_ignore_regions(
    ignore_polys: Dict[int, List[List[float]]], image_sizes: Dict[int, Tuple[int, int]]
) -> Dict[int, np.ndarray]:
    from detectron2_tpu.evaluation.rle import polygons_to_mask

    out = {}
    for img_id, polys in ignore_polys.items():
        h, w = image_sizes[img_id]
        out[img_id] = polygons_to_mask([np.asarray(p) for p in polys], h, w).astype(np.uint8)
    return out
