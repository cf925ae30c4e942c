"""Top-k dispatch for large score tensors.

The dense one-stage decode ranks the flattened (anchor, class) score tensor —
[B, HWA*C] is up to 12.1M entries per image per FPN level for RetinaNet at
800x1344 (vs the RPN's 80x smaller class-agnostic objectness). XLA lowers
``lax.top_k`` on such sizes to a full sort, which dominated RetinaNet
inference (MFU 5.3%, slower than the published V100 baseline). On TPU,
``lax.approx_max_k`` is the hardware-optimal partial-reduction path
(arXiv:2206.14286); with ``recall_target`` close to 1 the handful of
maybe-missed candidates sit in the sub-threshold tail that NMS/top-100
discards anyway.

CPU (and any non-TPU backend) keeps exact ``lax.top_k`` — parity goldens and
the reference-semantics tests all run on CPU and are bit-identical.
``D2T_EXACT_TOPK=1`` forces the exact path everywhere.
"""

import os

import jax

__all__ = ["top_k_padded"]


def top_k_padded(flat, k: int, recall_target: float = 0.99):
    """(values, indices) of the top ``k`` entries of ``flat`` along its last
    axis: exact everywhere except on TPU, where the approx_max_k partial
    reduction runs (aggregated to exact top-k ordering of its candidates)."""
    if jax.default_backend() == "tpu" and os.environ.get("D2T_EXACT_TOPK", "0") != "1":
        return jax.lax.approx_max_k(
            flat, k, recall_target=recall_target, aggregate_to_topk=True
        )
    return jax.lax.top_k(flat, k)
