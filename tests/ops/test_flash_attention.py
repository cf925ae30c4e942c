"""Flash-attention kernel parity vs the exact XLA formulation (interpret
mode on CPU), including the decomposed rel-pos bias tiles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.attention import (
    _attn_xla,
    _attn_xla_t,
    attention_plan,
    attention_with_rel_pos,
)
from detectron2_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_v2,
    flash_attention_v2_t,
    v2_plan,
)


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


def test_flash_v2_t_native_transposed_factors():
    """flash_attention_v2_t consumes producer-side transposed factors
    ([B, Hk, S] / [B, Wk, S]) without any internal relayout; must match the
    exact formulation and the standard-layout wrapper bit-for-bit."""
    B, H, W, D = 2, 16, 16, 64
    S = H * W
    q, k, v = _qkv(B, S, D, seed=31)
    r = np.random.RandomState(32)
    rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    got_t = flash_attention_v2_t(
        q, k, v, rel_h.swapaxes(1, 2), rel_w.swapaxes(1, 2),
        scale=scale, block_q=64, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want), rtol=2e-5, atol=2e-5)
    got_std = flash_attention_v2(
        q, k, v, rel_h, rel_w, scale=scale, block_q=64, block_k=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(got_std))


def test_attn_xla_t_matches_standard_layout():
    """The transposed-factor exact formulation (v2's VJP recompute target)
    and its gradients must agree with the standard-layout one."""
    B, H, W, D = 2, 8, 8, 32
    S = H * W
    q, k, v = _qkv(B, S, D, seed=41)
    r = np.random.RandomState(42)
    rel_h = jnp.asarray(r.randn(B, S, H).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(r.randn(B, S, W).astype(np.float32) * 0.2)
    scale = D**-0.5
    want = _attn_xla(q, k, v, rel_h, rel_w, scale)
    got = _attn_xla_t(q, k, v, rel_h.swapaxes(1, 2), rel_w.swapaxes(1, 2), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    g_std = jax.grad(lambda rh: (_attn_xla(q, k, v, rh, rel_w, scale) ** 2).sum())(rel_h)
    g_t = jax.grad(
        lambda rht: (_attn_xla_t(q, k, v, rht, rel_w.swapaxes(1, 2), scale) ** 2).sum()
    )(rel_h.swapaxes(1, 2))
    np.testing.assert_allclose(
        np.asarray(g_t.swapaxes(1, 2)), np.asarray(g_std), rtol=1e-5, atol=1e-5
    )


def test_decomposed_rel_pos_factors_transposed_layout():
    """transposed=True must be exactly the swapaxes of the standard layout."""
    from detectron2_tpu.modeling.backbone.vit import decomposed_rel_pos_factors

    B, H, W, D = 2, 8, 8, 16
    r = np.random.RandomState(51)
    q = jnp.asarray(r.randn(B, H * W, D).astype(np.float32))
    rph = jnp.asarray(r.randn(2 * H - 1, D).astype(np.float32))
    rpw = jnp.asarray(r.randn(2 * W - 1, D).astype(np.float32))
    rel_h, rel_w = decomposed_rel_pos_factors(q, rph, rpw, (H, W), (H, W))
    rel_ht, rel_wt = decomposed_rel_pos_factors(q, rph, rpw, (H, W), (H, W), transposed=True)
    np.testing.assert_allclose(
        np.asarray(rel_ht), np.asarray(rel_h.swapaxes(1, 2)), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rel_wt), np.asarray(rel_w.swapaxes(1, 2)), rtol=1e-6, atol=1e-6
    )


def test_attention_plan_rules(monkeypatch):
    """Dispatch boundaries: v1 is the default flash kernel (v2 measured
    slower end-to-end on ViTDet-B); D2T_FLASH_V2=1 opts into v2 for
    pipelineable global shapes only; xla off-TPU and for odd shapes."""
    on_tpu = jax.default_backend() == "tpu"
    # CPU/interpret test environment: auto never picks flash off-TPU
    if not on_tpu:
        assert attention_plan(4096, True, 64, 64) == "xla"
    # forced flash exercises the plan logic regardless of backend
    monkeypatch.delenv("D2T_FLASH_V2", raising=False)
    assert attention_plan(4096, True, 64, 64, use_flash="always") == "v1"
    assert attention_plan(196, True, 14, 14, use_flash="always") == "v1"
    assert attention_plan(256, True, 16, 16, use_flash="never") == "xla"

    monkeypatch.setenv("D2T_FLASH_V2", "1")
    assert attention_plan(4096, True, 64, 64, use_flash="always") == "v2"  # r=8
    assert attention_plan(196, True, 14, 14, use_flash="always") == "v1"  # single k block
    # no-bias global shape pipelines too
    assert attention_plan(4096, False, None, None, use_flash="always") == "v2"
    # v2_plan consistency: bias width that violates r % 8 == 0
    ok, _ = v2_plan(1024, 8, 128)  # r = 512 // 128 = 4
    assert not ok


def test_dispatch_gradients_flow():
    """The hybrid custom_vjp path must be differentiable (XLA recompute)."""
    q, k, v = _qkv(1, 256, 32, seed=6)

    def loss(q):
        out = attention_with_rel_pos(q, k, v, scale=0.1, use_flash="never")
        return (out**2).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
