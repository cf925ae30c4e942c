"""Attention dispatch: Pallas flash forward on TPU, XLA einsum elsewhere.

The backward pass always uses the XLA formulation's autodiff (recomputed from
the saved q/k/v — training wraps ViT blocks in remat anyway, so this adds no
extra memory over the baseline).

Dispatch (``attention_plan``) picks between three implementations:

- ``"v1"``: whole-k-resident Pallas kernel — the DEFAULT flash path for both
  the windowed (S=196) and global (S=4096) ViT shapes.
- ``"v2"``: pipelined-k-grid Pallas kernel (``flash_attention_v2_t``) taking
  bias factors in its native TRANSPOSED layout ([B, Hk, S] / [B, Wk, S]);
  opt-in via D2T_FLASH_V2=1. Measured on ViTDet-B (v5e, batch 8, 1024^2):
  v2 is 4x v1 standalone on the global-block shape (17.3 vs 69.1 ms at B=96,
  bit-identical) but loses end-to-end BOTH ways of producing its factors —
  28.9 img/s with post-einsum swapaxes (round 3) and 28.92 img/s with the
  factors emitted transposed at the producer
  (``decomposed_rel_pos_factors(..., transposed=True)``), vs 31.86 img/s on
  v1: the transposed einsum ("bhwc,hkc->bkhw") costs XLA more than the
  kernel saves. Callers still query the plan first so the factors are
  produced in whichever layout the chosen kernel wants.
- ``"xla"``: exact einsum formulation (non-TPU backends, odd S).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_with_rel_pos", "attention_plan"]


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


def _attn_xla_t(q, k, v, rel_ht, rel_wt, scale):
    """Exact formulation with TRANSPOSED factors ([B, Hk, S] / [B, Wk, S])."""
    s = jnp.einsum("bqc,bkc->bqk", q * scale, k, preferred_element_type=jnp.float32)
    if rel_ht is not None:
        B, S, _ = q.shape
        h_k = rel_ht.shape[1]
        w_k = rel_wt.shape[1]
        # bias[b, q, (h2, w2)] = rel_ht[b, h2, q] + rel_wt[b, w2, q]
        bias = (
            rel_ht.transpose(0, 2, 1)[:, :, :, None]
            + rel_wt.transpose(0, 2, 1)[:, :, None, :]
        ).reshape(B, S, S)
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", p, v, preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_flash_v1(q, k, v, rel_h, rel_w, scale):
    from detectron2_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, rel_h, rel_w, scale=scale)


def _attn_flash_v1_fwd(q, k, v, rel_h, rel_w, scale):
    return _attn_flash_v1(q, k, v, rel_h, rel_w, scale), (q, k, v, rel_h, rel_w)


def _attn_flash_v1_bwd(scale, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(lambda *a: _attn_xla(*a, scale), q, k, v, rel_h, rel_w)
    return vjp(g)


_attn_flash_v1.defvjp(_attn_flash_v1_fwd, _attn_flash_v1_bwd)

# round-3 name, kept for tests/tools that A/B the kernels directly
_attn_hybrid = _attn_flash_v1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_flash_v2t(q, k, v, rel_ht, rel_wt, scale):
    from detectron2_tpu.ops.pallas.flash_attention import flash_attention_v2_t

    return flash_attention_v2_t(q, k, v, rel_ht, rel_wt, scale=scale)


def _attn_flash_v2t_fwd(q, k, v, rel_ht, rel_wt, scale):
    return _attn_flash_v2t(q, k, v, rel_ht, rel_wt, scale), (q, k, v, rel_ht, rel_wt)


def _attn_flash_v2t_bwd(scale, res, g):
    q, k, v, rel_ht, rel_wt = res
    _, vjp = jax.vjp(lambda *a: _attn_xla_t(*a, scale), q, k, v, rel_ht, rel_wt)
    return vjp(g)


_attn_flash_v2t.defvjp(_attn_flash_v2t_fwd, _attn_flash_v2t_bwd)


def attention_plan(
    S: int,
    has_bias: bool,
    h_k: Optional[int] = None,
    w_k: Optional[int] = None,
    use_flash: str = "auto",
) -> str:
    """Which implementation ``attention_with_rel_pos`` will run: "v1" | "v2" | "xla".

    Query this BEFORE producing rel-pos bias factors so they can be emitted in
    the chosen kernel's native layout ("v2" wants transposed factors).

    auto rule: on TPU, flash runs for S <= 512 (single-k-block windowed
    shapes) and for S >= 1024 with S % 256 == 0 (global shapes); everything
    else — 512 < S < 1024, big S not divisible by 256, non-TPU backends —
    takes the XLA einsum. The flash kernel is v1 unless D2T_FLASH_V2=1 opts
    into the pipelined v2 (measured slower end-to-end on ViTDet-B despite a
    4x standalone win — see the module docstring) and the shape fits its
    sublane constraint (:func:`v2_plan`).
    """
    import os

    if use_flash == "never":
        return "xla"
    if use_flash == "auto":
        on_tpu = jax.default_backend() == "tpu"
        big = S >= 1024 and S % 256 == 0
        small = S <= 512
        if not (on_tpu and (big or small)):
            return "xla"
    if os.environ.get("D2T_FLASH_V2", "0") != "1":
        return "v1"
    from detectron2_tpu.ops.pallas.flash_attention import v2_plan

    ok, _ = v2_plan(S, h_k, w_k) if has_bias else v2_plan(S, None, None)
    return "v2" if ok else "v1"


def attention_with_rel_pos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: Optional[jnp.ndarray] = None,
    rel_w: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    use_flash: str = "auto",
    factors_transposed: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale + decomposed-rel-pos bias) v.

    Args:
        q, k, v: [B, S, D].
        rel_h / rel_w: optional decomposed bias factors. Standard layout
            [B, S, Hk] / [B, S, Wk] (Hk * Wk == S), or — when
            ``factors_transposed`` — the v2-kernel-native [B, Hk, S] /
            [B, Wk, S]. Produce whichever layout ``attention_plan`` asks for.
        use_flash: "auto" (see :func:`attention_plan` for the exact rule),
            "never", or "always".
    """
    S = q.shape[1]
    has_bias = rel_h is not None
    if has_bias:
        h_k = rel_h.shape[1] if factors_transposed else rel_h.shape[-1]
        w_k = rel_w.shape[1] if factors_transposed else rel_w.shape[-1]
    else:
        h_k = w_k = None
    plan = attention_plan(S, has_bias, h_k, w_k, use_flash)
    if use_flash == "always" and plan == "xla":
        plan = "v1"

    if plan == "v2":
        if has_bias and not factors_transposed:
            rel_h, rel_w = rel_h.swapaxes(1, 2), rel_w.swapaxes(1, 2)
        return _attn_flash_v2t(q, k, v, rel_h, rel_w, scale)
    if has_bias and factors_transposed:
        rel_h, rel_w = rel_h.swapaxes(1, 2), rel_w.swapaxes(1, 2)
    if plan == "v1":
        return _attn_flash_v1(q, k, v, rel_h, rel_w, scale)
    return _attn_xla(q, k, v, rel_h, rel_w, scale)
