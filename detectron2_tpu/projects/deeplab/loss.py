"""DeepLab hard-pixel-mining cross entropy
(reference projects/DeepLab/deeplab/loss.py DeepLabCE).

The reference sorts per-pixel losses and keeps the top-K fraction. On TPU the
K must be static for a fixed-shape program, so K is computed from the padded
pixel count at trace time; ignored pixels contribute -inf-like zero weight and
can never enter the top-K ahead of real pixels (their loss is set to -1).
"""

import jax
import jax.numpy as jnp


def hard_pixel_mining_ce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = 255,
    top_k_percent: float = 0.2,
    weight=None,
) -> jnp.ndarray:
    """Cross entropy averaged over the hardest ``top_k_percent`` pixels.

    Args:
        logits: [B, H, W, C] float logits.
        targets: [B, H, W] int labels (ignore_index skipped).
        top_k_percent: fraction of (valid-padded) pixels kept; 1.0 = plain CE.
    """
    num_classes = logits.shape[-1]
    valid = targets != ignore_index
    t = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * jnp.asarray(weight)[t]
    nll = jnp.where(valid, nll, 0.0)

    if top_k_percent >= 1.0:
        return nll.sum() / jnp.maximum(valid.sum(), 1)

    flat = nll.reshape(nll.shape[0], -1)
    vflat = valid.reshape(valid.shape[0], -1)
    k = max(1, int(top_k_percent * flat.shape[1]))
    # ignored pixels get -1 so they sort after every real pixel (loss >= 0)
    top, _ = jax.lax.top_k(jnp.where(vflat, flat, -1.0), k)
    kept = top > -0.5
    return jnp.where(kept, top, 0.0).sum() / jnp.maximum(kept.sum(), 1)
