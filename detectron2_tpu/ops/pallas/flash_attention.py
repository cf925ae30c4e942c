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

__all__ = ["flash_attention", "flash_attention_v2", "flash_attention_v2_t", "v2_plan"]


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


def _kernel_v2(
    q_ref, k_ref, v_ref, rel_ht_ref, rel_wt_ref, o_ref, m_ref, l_ref, acc_ref,
    *maybe_bw, w_k, scale, has_bias, k_axis=2,
):
    """One (batch-head, q-block, k-block) grid step; k innermost.

    vs _kernel: the k loop is a grid dimension, so Mosaic double-buffers the
    k/v (and rel) block DMAs against compute instead of holding all of k/v
    resident; the bias factors arrive TRANSPOSED ([Hk, S] / [Wk, S] — the
    k-block's r = block_k // w_k rows of rel_h slice on the second-last dim,
    which Mosaic allows where lane slicing isn't) so the per-step h-bias
    expansion is an [r, bk] 0/1 matmul — Hk/r-fold smaller than v1's
    [Hk, bk] in-kernel selection matmul; the k-invariant w-factor tile is
    built once per q-block and cached in VMEM scratch. Online-softmax state
    (m, l, acc) lives in scratch across the k steps."""
    kk = pl.program_id(k_axis)
    n_k = pl.num_programs(k_axis)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    bw_ref = maybe_bw[0] if has_bias else None

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        if has_bias:
            # bias_w[q, j] = rel_w[q, j % w_k]: k-block invariant
            kkw = jax.lax.broadcasted_iota(jnp.int32, (w_k, bk), 1)
            roww = jax.lax.broadcasted_iota(jnp.int32, (w_k, bk), 0)
            expand_w = (kkw % w_k == roww).astype(jnp.float32)
            bw_ref[...] = jax.lax.dot_general(
                rel_wt_ref[0].astype(jnp.float32), expand_w,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [bq, bk] from [w_k, bq] x [w_k, bk]

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]

    if has_bias:
        r = rel_ht_ref.shape[1]  # bias-grid rows covered by this k block
        kk_h = jax.lax.broadcasted_iota(jnp.int32, (r, bk), 1)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (r, bk), 0)
        expand_h = (kk_h // w_k == row_h).astype(jnp.float32)  # [r, bk]
        s += jax.lax.dot_general(
            rel_ht_ref[0].astype(jnp.float32), expand_h,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [bq, bk] from [r, bq] x [r, bk]
        s += bw_ref[...]

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * corr + p.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def v2_plan(S: int, h_k: Optional[int], w_k: Optional[int], block_k: int = 512):
    """Whether the pipelined v2 kernel applies to this shape, and its block_k.

    Returns (ok, block_k). v2 needs (a) a multi-block k loop to pipeline and
    (b) when biased, r = block_k // w_k to be a multiple of 8 so the rel_h
    k-block slice rides Mosaic's (8, 128) sublane tiling. Callers use this to
    produce bias factors in the kernel-native transposed layout (see
    :func:`flash_attention_v2_t`)."""
    block_k = min(block_k, S)
    if w_k is not None:
        if h_k * w_k != S:
            return False, block_k
        if block_k % w_k != 0:
            block_k = w_k * max(1, block_k // w_k)
        if S // block_k == 1 or (block_k // w_k) % 8 != 0:
            # single k block (windowed ViT shapes, S=196): there is nothing
            # to pipeline and the factor transpose + scratch init are pure
            # overhead — v1 measures faster end-to-end (31.9 vs 27.8 img/s
            # on ViTDet-B). r % 8 != 0: rel_h's per-k-block row slice would
            # violate Mosaic's (8, 128) block tiling rule. v1 holds the
            # whole factor in VMEM and selects rows in-kernel.
            return False, block_k
        return True, block_k
    return S % block_k == 0 and S // block_k > 1, block_k


def flash_attention_v2_t(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_ht: Optional[jnp.ndarray] = None,
    rel_wt: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pipelined-grid flash attention taking TRANSPOSED bias factors.

    rel_ht: [B, Hk, S], rel_wt: [B, Wk, S] — the kernel-native layout (each
    k block slices r rows of rel_ht on the sublane dim). Producing the
    factors in this layout at the source (``decomposed_rel_pos_factors(...,
    transposed=True)``) lets XLA emit them straight from the einsum instead
    of relayouting [B, S, 64] -> [B, 64, S] (a ~100 MB lane-crossing copy at
    ViT-B scale) — that relayout is what kept v2 off by default in round 3.

    Callers must have validated the shape with :func:`v2_plan`.
    """
    B, S, D = q.shape
    has_bias = rel_ht is not None
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if has_bias:
        h_k, w_k = rel_ht.shape[1], rel_wt.shape[1]
        ok, block_k = v2_plan(S, h_k, w_k, block_k)
        assert ok, (S, h_k, w_k, block_k)
        r = block_k // w_k
    else:
        w_k = block_k
        r = 1
        rel_ht = jnp.zeros((B, 1, S), q.dtype)
        rel_wt = jnp.zeros((B, 1, S), q.dtype)
    assert S % block_q == 0 and S % block_k == 0, (S, block_q, block_k)

    n_k = S // block_k
    grid = (B, S // block_q, n_k)
    kernel = functools.partial(_kernel_v2, w_k=w_k, scale=scale, has_bias=has_bias)
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, D), jnp.float32),
    ]
    if has_bias:
        # the k-invariant w-factor bias tile, built once per q-block
        scratch.append(pltpu.VMEM((block_q, block_k), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            (
                pl.BlockSpec((1, r, block_q), lambda b, i, j: (b, j, i))
                if has_bias
                else pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i))
            ),
            pl.BlockSpec((1, rel_wt.shape[1], block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), v.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v, rel_ht, rel_wt)


def flash_attention_v2(
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
    """Pipelined-grid variant of :func:`flash_attention` (same contract,
    standard-layout factors — transposed internally; prefer
    :func:`flash_attention_v2_t` with producer-side transposed factors).

    Falls back to :func:`flash_attention` when the bias-row split doesn't
    meet Mosaic's sublane constraint (see :func:`v2_plan`)."""
    B, S, D = q.shape
    if rel_h is not None:
        ok, _ = v2_plan(S, rel_h.shape[-1], rel_w.shape[-1], block_k)
        if not ok:
            return flash_attention(
                q, k, v, rel_h, rel_w, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret,
            )
        rel_ht = rel_h.swapaxes(1, 2)  # [B, Hk, S]
        rel_wt = rel_w.swapaxes(1, 2)  # [B, Wk, S]
    else:
        rel_ht = rel_wt = None
    return flash_attention_v2_t(
        q, k, v, rel_ht, rel_wt, scale=scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


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
