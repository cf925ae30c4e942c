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
    import os

    # v2 (pipelined k-grid) wins standalone on the S=4096 global shape
    # (17.3 vs 69.1 ms at B=96) but LOSES end-to-end in ViTDet-B (28.9 vs
    # 31.9 img/s): its transposed bias-factor layout forces lane-crossing
    # relayouts of [B, 4096, 64] factors that XLA otherwise fuses away.
    # Keep v1 the default until the factor producers emit that layout
    # natively; A/B with D2T_FLASH_V2=1.
    if os.environ.get("D2T_FLASH_V2", "0") == "1":
        from detectron2_tpu.ops.pallas.flash_attention import flash_attention_v2

        return flash_attention_v2(q, k, v, rel_h, rel_w, scale=scale)
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
        on_tpu = jax.default_backend() == "tpu"
        # global ViT blocks: S >= 1024, multi-block online softmax
        big = S >= 1024 and S % 256 == 0
        # windowed ViT blocks (S = 196 at ViTDet scale): single-block flash.
        # The XLA path materializes [B*heads*windows, S, S] f32 scores in HBM
        # (~1.8 GB per ViT-B block at 1024^2) — profiled at ~55 ms/batch-8
        # across the 8 windowed blocks, vs keeping the tile in VMEM.
        small = S <= 512
        flash = on_tpu and (big or small)
    else:
        flash = use_flash == "always"
    if flash:
        return _attn_hybrid(q, k, v, rel_h, rel_w, scale)
    return _attn_xla(q, k, v, rel_h, rel_w, scale)
