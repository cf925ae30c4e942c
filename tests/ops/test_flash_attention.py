"""Flash-attention kernel parity vs the exact XLA formulation (interpret
mode on CPU), including the decomposed rel-pos bias tiles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.attention import _attn_xla, attention_with_rel_pos
from detectron2_tpu.ops.pallas.flash_attention import flash_attention, flash_attention_v2


def _qkv(B=2, S=256, D=64, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, S, D).astype(np.float32))
    k = jnp.asarray(r.randn(B, S, D).astype(np.float32))
    v = jnp.asarray(r.randn(B, S, D).astype(np.float32))
    return q, k, v


def test_flash_matches_xla_no_bias():
    q, k, v = _qkv()
    scale = 0.125
    want = _attn_xla(q, k, v, None, None, scale)
    got = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_matches_xla_with_rel_pos():
    B, H, W, D = 2, 16, 16, 64
    S = H * W
    q, k, v = _qkv(B, S, D, seed=3)
    r = np.random.RandomState(4)
    rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    got = flash_attention(
        q, k, v, rel_h, rel_w, scale=scale, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_uneven_blocks_and_bf16():
    q, k, v = _qkv(1, 512, 64, seed=5)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    want = _attn_xla(q, k, v, None, None, 0.125)
    got = flash_attention(q, k, v, scale=0.125, block_q=256, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_flash_windowed_vit_shape():
    """The ViT windowed-block shape (S=196=14x14, decomposed bias, bf16):
    single-block flash must match the XLA materialized formulation."""
    B, H, W, D = 3, 14, 14, 64
    S = H * W
    q, k, v = _qkv(B, S, D, seed=11)
    r = np.random.RandomState(12)
    rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    got = flash_attention(q, k, v, rel_h, rel_w, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got_bf16 = flash_attention(
        qb, kb, vb, rel_h.astype(jnp.bfloat16), rel_w.astype(jnp.bfloat16),
        scale=scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_bf16, np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("bias", [False, True])
def test_flash_v2_matches_xla(bias):
    """Pipelined-grid kernel variant: multi-k-block online softmax with
    grid-sliced rel_h rows and cached bias_w scratch."""
    B, H, W, D = 2, 16, 16, 64
    S = H * W
    q, k, v = _qkv(B, S, D, seed=21)
    rel_h = rel_w = None
    if bias:
        r = np.random.RandomState(22)
        rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
        rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    # block_k=128 with Wk=16 -> r=8 bias rows per k block: the pipelined-grid
    # path proper (r%8==0); block_k=64 would fall back to v1
    got = flash_attention_v2(
        q, k, v, rel_h, rel_w, scale=scale, block_q=64, block_k=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    if bias:
        # the fallback-to-v1 guard (r=4, multi-block) must also be exact
        got_fb = flash_attention_v2(
            q, k, v, rel_h, rel_w, scale=scale, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_fb), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_v2_windowed_shape():
    B, H, W, D = 3, 14, 14, 64
    S = H * W
    q, k, v = _qkv(B, S, D, seed=23)
    r = np.random.RandomState(24)
    rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    got = flash_attention_v2(q, k, v, rel_h, rel_w, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_dispatch_gradients_flow():
    """The hybrid custom_vjp path must be differentiable (XLA recompute)."""
    q, k, v = _qkv(1, 256, 32, seed=6)

    def loss(q):
        out = attention_with_rel_pos(q, k, v, scale=0.1, use_flash="never")
        return (out**2).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
