"""Flash attention Pallas kernel for ViTDet global blocks.

The ViT backbone's global attention at 1024px operates on S = 64x64 = 4096
tokens; materializing [S, S] scores per head is 64MB f32 — HBM-bandwidth
bound under XLA. This kernel runs the standard online-softmax blocking
(q-block resident in VMEM, k/v streamed in blocks, f32 running max/denom)
so scores never leave VMEM.

ViTDet specifics (reference detectron2/modeling/backbone/vit.py:232-360 +
backbone/utils.py:63-127): global attention adds a *decomposed* relative
position bias  bias[q=(h,w), k=(h2,w2)] = rel_h[q, h2] + rel_w[q, w2].
The [S, Hk] / [S, Wk] factors are tiny, computed XLA-side; the kernel
re-materializes each [block_q, block_k] bias tile in-register by broadcasting
the two factors, so the full [S, S] bias is never built either.

Forward-only: the backward pass recomputes attention with the XLA einsum
formulation under ``jax.custom_vjp`` (training wraps blocks in remat anyway).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _kernel(q_ref, k_ref, v_ref, rel_h_ref, rel_w_ref, o_ref, *, block_k, w_k, scale, has_bias):
    """One (batch-head, q-block) grid step."""
    # keep q/k in their native dtype (bf16 on TPU): the MXU runs bf16 x bf16
    # -> f32 at full rate; upcasting inputs first would halve matmul speed
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [bq, D]
    S = k_ref.shape[1]
    bq = q.shape[0]
    n_kb = S // block_k
    r = block_k // w_k if has_bias else 0  # rows of the 2D grid per k block

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)

    if has_bias:
        # Mosaic cannot reshape [bq, r, w_k] -> [bq, block_k] in-register (nor
        # dynamically lane-slice rel_h per k-block), so the bias tile is built
        # with MXU matmuls against 0/1 selection matrices:
        #   bias_j = rel_h_full @ Eh(j) + rel_w_full @ Ew, where
        #   Eh(j)[i, kk] = 1 iff i == j*r + kk // w_k  (block j's row factors)
        #   Ew[i, kk]    = 1 iff kk % w_k == i         (k-block invariant)
        h_k = rel_h_ref.shape[-1]
        kk_h = jax.lax.broadcasted_iota(jnp.int32, (h_k, block_k), 1)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (h_k, block_k), 0)
        kkw = jax.lax.broadcasted_iota(jnp.int32, (w_k, block_k), 1)
        roww = jax.lax.broadcasted_iota(jnp.int32, (w_k, block_k), 0)
        expand_w = (kkw % w_k == roww).astype(jnp.float32)  # [Wk, bk]
        rh_full = rel_h_ref[0].astype(jnp.float32)  # [bq, Hk]
        rw_full = rel_w_ref[0].astype(jnp.float32)  # [bq, Wk]
        bias_w = jax.lax.dot_general(
            rw_full, expand_w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]

    def body(j, carry):
        # fori_loop (not an unrolled python loop): unrolling n_kb iterations
        # blows the Mosaic scoped-vmem stack at ViT-B scale (96 batch-heads)
        m, l, acc = carry
        kblk = k_ref[0, pl.ds(j * block_k, block_k)]  # [bk, D]
        vblk = v_ref[0, pl.ds(j * block_k, block_k)]

        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]

        if has_bias:
            sel_h = (row_h == j * r + kk_h // w_k).astype(jnp.float32)  # [Hk, bk]
            s += jax.lax.dot_general(
                rh_full, sel_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            s += bias_w

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # [bq, bk]
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: Optional[jnp.ndarray] = None,
    rel_w: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q k^T * scale + bias) v without materializing [S, S].

    Args:
        q, k, v: [B, S, D] (B = batch*heads).
        rel_h: optional [B, S, Hk] decomposed rel-pos factor (rows).
        rel_w: optional [B, S, Wk] factor (cols); Hk * Wk must equal S and
            block_k must be a multiple of Wk (the 2D row width).
        scale: applied to q before the score matmul.

    Returns:
        [B, S, D], dtype of v.
    """
    B, S, D = q.shape
    has_bias = rel_h is not None
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if has_bias:
        w_k = rel_w.shape[-1]
        h_k = rel_h.shape[-1]
        assert h_k * w_k == S, (h_k, w_k, S)
        if block_k % w_k != 0:
            block_k = w_k * max(1, block_k // w_k)
    else:
        w_k = block_k
        rel_h = jnp.zeros((B, S, 1), q.dtype)
        rel_w = jnp.zeros((B, S, 1), q.dtype)
    assert S % block_q == 0 and S % block_k == 0, (S, block_q, block_k)

    grid = (B, S // block_q)
    kernel = functools.partial(
        _kernel, block_k=block_k, w_k=w_k, scale=scale, has_bias=has_bias
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, rel_h.shape[-1]), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, rel_w.shape[-1]), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), v.dtype),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)
