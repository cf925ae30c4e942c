"""API-parity alias for the reference's fast C++ COCOeval driver
(reference detectron2/evaluation/fast_eval_api.py:13-121).

In this framework the C++ acceleration lives inside
:class:`~detectron2_tpu.evaluation.coco_eval_np.COCOevalNP` itself: when the
native library (``detectron2_tpu/csrc`` → ``libd2t_eval.so``, loaded via
ctypes in :mod:`detectron2_tpu.evaluation._native`) is importable, per-image
evaluation and RLE IoU run in C++; otherwise the vectorized numpy path runs.
``COCOeval_opt`` is therefore just the canonical class under the reference's
name so downstream code written against ``fast_eval_api`` keeps working.
"""

from detectron2_tpu.evaluation.coco_eval_np import COCOevalNP as COCOeval_opt

__all__ = ["COCOeval_opt"]
