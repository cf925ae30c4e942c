"""Attention dispatch: Pallas flash forward on TPU, XLA einsum elsewhere.

The backward pass always uses the XLA formulation's autodiff (recomputed from
the saved q/k/v — training wraps ViT blocks in remat anyway, so this adds no
extra memory over the baseline).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_with_rel_pos"]


def _attn_xla(q, k, v, rel_h, rel_w, scale):
    """Exact reference formulation (materializes [S, S] scores)."""
    s = jnp.einsum("bqc,bkc->bqk", q * scale, k, preferred_element_type=jnp.float32)
    if rel_h is not None:
        B, S, _ = q.shape
        h_k = rel_h.shape[-1]
        w_k = rel_w.shape[-1]
        bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(B, S, S)
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", p, v, preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_hybrid(q, k, v, rel_h, rel_w, scale):
    from detectron2_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, rel_h, rel_w, scale=scale)


def _attn_hybrid_fwd(q, k, v, rel_h, rel_w, scale):
    return _attn_hybrid(q, k, v, rel_h, rel_w, scale), (q, k, v, rel_h, rel_w)


def _attn_hybrid_bwd(scale, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(lambda *a: _attn_xla(*a, scale), q, k, v, rel_h, rel_w)
    return vjp(g)


_attn_hybrid.defvjp(_attn_hybrid_fwd, _attn_hybrid_bwd)


def attention_with_rel_pos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: Optional[jnp.ndarray] = None,
    rel_w: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    use_flash: str = "auto",
) -> jnp.ndarray:
    """softmax(q k^T * scale + decomposed-rel-pos bias) v.

    Args:
        q, k, v: [B, S, D].
        rel_h / rel_w: optional [B, S, Hk] / [B, S, Wk] decomposed bias
            factors (Hk * Wk == S).
        use_flash: "auto" (TPU + S >= 1024), "never", or "always".
    """
    S = q.shape[1]
    if use_flash == "auto":
        flash = jax.default_backend() == "tpu" and S >= 1024 and S % 256 == 0
    else:
        flash = use_flash == "always"
    if flash:
        return _attn_hybrid(q, k, v, rel_h, rel_w, scale)
    return _attn_xla(q, k, v, rel_h, rel_w, scale)
