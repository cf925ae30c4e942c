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

The choice is configurable end to end: models plumb
``cfg.TEST.EXACT_TOPK`` / ``cfg.TEST.TOPK_RECALL_TARGET`` into the ``exact``
/ ``recall_target`` arguments (RetinaNet/FCOS from_config), and
``D2T_EXACT_TOPK=1`` force-overrides to exact everywhere (environment
escape hatch for A/B runs on an already-built model). The TPU-side recall
of the approximate path is gated by ``measured_recall`` (see
tests_tpu/test_topk_recall.py, run on a real chip) so a regression in a
future JAX/XLA version is caught rather than silently shipped.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["top_k_padded", "measured_recall"]


def top_k_padded(flat, k: int, recall_target: float = 0.99, exact: Optional[bool] = None):
    """(values, indices) of the top ``k`` entries of ``flat`` along its last
    axis.

    exact=True: ``lax.top_k`` on every backend. exact=False: the TPU
    approx_max_k partial reduction (aggregated to exact top-k ordering of
    its candidates) when on TPU, exact elsewhere. exact=None (default):
    same as False unless ``D2T_EXACT_TOPK=1`` is set.
    """
    if exact is None:
        exact = os.environ.get("D2T_EXACT_TOPK", "0") == "1"
    if not exact and jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(
            flat, k, recall_target=recall_target, aggregate_to_topk=True
        )
    return jax.lax.top_k(flat, k)


def measured_recall(
    n: int = 12_100_000 // 5,
    k: int = 1000,
    recall_target: float = 0.99,
    batch: int = 2,
    seed: int = 0,
) -> float:
    """Measured recall of the dispatched top-k against exact ``lax.top_k``
    on i.i.d. scores at RetinaNet-decode scale (defaults: one 800x1344 FPN
    level's [HWA*C] flattened scores). On CPU this is 1.0 by construction;
    on TPU it gates the approx_max_k path's actual recall."""
    key = jax.random.PRNGKey(seed)
    flat = jax.random.uniform(key, (batch, n), jnp.float32)
    _, approx_idx = jax.jit(lambda x: top_k_padded(x, k, recall_target=recall_target))(flat)
    _, exact_idx = jax.jit(lambda x: jax.lax.top_k(x, k))(flat)
    hits = 0
    for b in range(batch):
        hits += len(set(approx_idx[b].tolist()) & set(exact_idx[b].tolist()))
    return hits / (batch * k)
