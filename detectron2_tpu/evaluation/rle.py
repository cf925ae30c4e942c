"""COCO-compatible run-length encoding (RLE) and polygon rasterization.

pycocotools is not available in this framework's environment, so the mask
codecs it provides (C maskApi) are re-implemented here in numpy:

- compressed RLE string codec (the 6-bit LEB-style format used in COCO json),
- column-major RLE <-> binary mask,
- polygon -> mask rasterization (cv2-based fill; COCO's integer 5x-upsampled
  boundary tracing differs at sub-pixel level, which is below AP resolution),
- RLE area / bbox / merge / pairwise IoU used by the COCO evaluator.
"""

from typing import Any, Dict, List, Sequence, Union

import numpy as np

__all__ = [
    "mask_to_rle",
    "rle_to_mask",
    "encode_counts",
    "decode_counts",
    "polygons_to_mask",
    "polygons_to_rle",
    "rle_area",
    "rle_to_bbox",
    "rle_merge",
    "rle_iou",
]


def encode_counts(counts: Sequence[int]) -> bytes:
    """Compress an RLE counts list to the COCO string format (maskApi rleToString)."""
    out = bytearray()
    cnts = list(counts)
    for i in range(len(cnts)):
        x = int(cnts[i])
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def decode_counts(s: Union[bytes, str]) -> List[int]:
    """Decompress a COCO RLE counts string (maskApi rleFrString)."""
    if isinstance(s, str):
        s = s.encode("ascii")
    cnts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Encode a binary mask (H, W) into compressed COCO RLE (column-major)."""
    mask = np.asarray(mask, order="F", dtype=np.uint8)
    h, w = mask.shape
    flat = mask.flatten(order="F")
    # run lengths, starting with the count of zeros
    diffs = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    boundaries = np.concatenate([[0], diffs, [len(flat)]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    if not flat.size:
        counts = [0]
    return {"size": [int(h), int(w)], "counts": encode_counts(counts)}


def _rle_counts(rle: Dict[str, Any]) -> List[int]:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        return decode_counts(counts)
    return list(counts)


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """Decode a COCO RLE (compressed or uncompressed counts) to a bool mask."""
    h, w = rle["size"]
    counts = _rle_counts(rle)
    total = h * w
    flat = np.zeros(total, dtype=bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    assert pos == total, f"RLE decodes to {pos} pixels, expected {total}"
    return flat.reshape((h, w), order="F")


def polygons_to_mask(polygons: List[np.ndarray], height: int, width: int) -> np.ndarray:
    """Rasterize polygons (list of flat [x0,y0,x1,y1,...] arrays) to a uint8 mask."""
    import cv2

    mask = np.zeros((height, width), dtype=np.uint8)
    pts = [
        np.round(np.asarray(p, dtype=np.float64).reshape(-1, 2)).astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def polygons_to_rle(polygons: List[np.ndarray], height: int, width: int) -> Dict[str, Any]:
    return mask_to_rle(polygons_to_mask(polygons, height, width))


def rle_area(rle: Dict[str, Any]) -> int:
    counts = _rle_counts(rle)
    return int(sum(counts[1::2]))


def rle_to_bbox(rle: Dict[str, Any]) -> np.ndarray:
    """Tight XYWH bbox of an RLE mask (maskApi rleToBbox)."""
    m = rle_to_mask(rle)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4, dtype=np.float64)
    return np.array(
        [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], dtype=np.float64
    )


def rle_merge(rles: List[Dict[str, Any]], intersect: bool = False) -> Dict[str, Any]:
    """Union (or intersection) of several RLE masks."""
    assert len(rles) > 0
    m = rle_to_mask(rles[0])
    for r in rles[1:]:
        if intersect:
            m &= rle_to_mask(r)
        else:
            m |= rle_to_mask(r)
    return mask_to_rle(m)


def rle_iou(dt: List[Dict[str, Any]], gt: List[Dict[str, Any]], iscrowd: List[int]) -> np.ndarray:
    """Pairwise IoU between detection and gt RLE masks (maskApi rleIou).

    For crowd gt, the denominator is the detection area (IoA), matching COCO.
    Uses the native RLE-space kernel (csrc/cocoeval.cpp) when available —
    no mask decompression; numpy fallback otherwise.
    """
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))

    from detectron2_tpu.evaluation._native import native_rle_iou

    dt_counts = [np.asarray(_rle_counts(d), np.uint32) for d in dt]
    gt_counts = [np.asarray(_rle_counts(g), np.uint32) for g in gt]
    native = native_rle_iou(dt_counts, gt_counts, list(iscrowd))
    if native is not None:
        return native

    d_masks = [rle_to_mask(d) for d in dt]
    g_masks = [rle_to_mask(g) for g in gt]
    ious = np.zeros((len(dt), len(gt)))
    for j, (g, crowd) in enumerate(zip(g_masks, iscrowd)):
        g_area = g.sum()
        for i, d in enumerate(d_masks):
            inter = np.logical_and(d, g).sum()
            if crowd:
                denom = d.sum()
            else:
                denom = d.sum() + g_area - inter
            ious[i, j] = inter / denom if denom > 0 else 0.0
    return ious
