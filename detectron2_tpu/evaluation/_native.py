"""ctypes binding for the native evaluation kernels (csrc/cocoeval.cpp).

Builds the shared library on first use (g++ -O3); all callers fall back to
the numpy implementations when the toolchain or binary is unavailable.
"""

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_LIB_LOCK = threading.Lock()
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "csrc", "cocoeval.cpp")
    out = os.path.join(here, "csrc", "libd2t_eval.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
                check=True,
                capture_output=True,
                timeout=120,
            )
            logger.info("Built native eval library at %s", out)
        except Exception as e:
            logger.warning("Could not build native eval library (%s); using numpy fallback.", e)
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError as e:
        logger.warning("Could not load native eval library (%s).", e)
        return None

    lib.d2t_evaluate_img.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.uint8),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.uint8),
    ]
    lib.d2t_rle_iou.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint32), np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.uint32), np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.uint8),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.d2t_rle_area.argtypes = [np.ctypeslib.ndpointer(np.uint32), ctypes.c_int64]
    lib.d2t_rle_area.restype = ctypes.c_int64
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LIB_LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_evaluate_img(
    iou_thrs: np.ndarray,  # [T]
    ious: np.ndarray,  # [D, G]
    gt_ignore: np.ndarray,  # [G]
    iscrowd: np.ndarray,  # [G]
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (dtm [T,D] gt-id-or-0 as index+1, gtm [T,G], dt_ig [T,D]) or
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dt_ig = np.zeros((T, D), np.uint8)
    lib.d2t_evaluate_img(
        T, D, G,
        np.ascontiguousarray(iou_thrs, np.float64),
        np.ascontiguousarray(ious, np.float64),
        np.ascontiguousarray(gt_ignore, np.uint8),
        np.ascontiguousarray(iscrowd, np.uint8),
        dtm, gtm, dt_ig,
    )
    return dtm, gtm, dt_ig


def native_rle_iou(dt_counts: List[np.ndarray], gt_counts: List[np.ndarray], iscrowd: List[int]) -> Optional[np.ndarray]:
    """Pairwise mask IoU in RLE space. counts are uncompressed uint32 run
    lengths (column-major, starting with zeros-count)."""
    lib = get_lib()
    if lib is None or len(dt_counts) == 0 or len(gt_counts) == 0:
        return None

    def pack(counts_list):
        lens = np.asarray([len(c) for c in counts_list], np.int64)
        offs = np.zeros(len(counts_list), np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        data = np.concatenate([np.asarray(c, np.uint32) for c in counts_list]) if counts_list else np.zeros(0, np.uint32)
        return np.ascontiguousarray(data), offs, lens

    dt_data, dt_off, dt_len = pack(dt_counts)
    gt_data, gt_off, gt_len = pack(gt_counts)
    out = np.zeros((len(dt_counts), len(gt_counts)), np.float64)
    lib.d2t_rle_iou(
        len(dt_counts), len(gt_counts),
        dt_data, dt_off, dt_len,
        gt_data, gt_off, gt_len,
        np.ascontiguousarray(np.asarray(iscrowd, np.uint8)),
        out,
    )
    return out
