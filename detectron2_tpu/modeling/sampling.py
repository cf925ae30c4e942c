"""Random positive/negative subsampling under jit.

Fixed-shape re-design of reference detectron2/modeling/sampling.py:9-54
(``subsample_labels``): instead of returning two variable-length index
vectors, returns exactly ``num_samples`` slots (indices + validity + is_pos),
selected by a randomized-topk. Semantics match the reference:

    num_pos = min(#positives, num_samples * positive_fraction)
    num_neg = min(#negatives, num_samples - num_pos)

selection is uniform without replacement within each class.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["subsample_labels_padded"]


def subsample_labels_padded(
    key: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Args:
        key: PRNG key.
        labels: int [N]; -1 = ignore, ``bg_label`` = negative, anything else
            positive.
        num_samples: number of output slots (static).
        positive_fraction: target fraction of positives.
        bg_label: the background label value.

    Returns:
        idx: int32 [num_samples] indices into labels (arbitrary where invalid)
        valid: bool [num_samples]
        is_positive: bool [num_samples] (valid positives only)
    """
    N = labels.shape[0]
    num_pos_target = int(num_samples * positive_fraction)

    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (N,))

    # uniform subset of positives capped at num_pos_target: membership in the
    # top-k of random keys (top_k beats a full argsort over ~200k anchors)
    pos_key = jnp.where(positive, r, -jnp.inf)
    _, pos_top = jax.lax.top_k(pos_key, min(num_pos_target, N))
    keep_pos = jnp.zeros((N,), bool).at[pos_top].set(True) & positive

    r2 = jax.random.uniform(k2, (N,))
    # priority bands: chosen positives (2), negatives (1), everything else 0;
    # random tiebreak strictly inside each band
    priority = keep_pos * 2.0 + negative * 1.0 + r2 * 0.999
    k = min(num_samples, N)  # fewer candidates than slots: take all, pad
    top_p, idx = jax.lax.top_k(priority, k)

    valid = top_p >= 1.0
    is_positive = top_p >= 2.0
    if k < num_samples:
        pad = num_samples - k
        idx = jnp.pad(idx, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        is_positive = jnp.pad(is_positive, (0, pad))
    return idx.astype(jnp.int32), valid, is_positive
