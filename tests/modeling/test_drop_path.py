"""Stochastic depth (DropPath) semantics in the transformer backbones
(reference timm drop_path used at vit.py:288-292, swin.py, mvit.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.layers import DropPath


def test_drop_path_identity_when_deterministic_or_zero():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3, 3, 8).astype(np.float32))
    m0 = DropPath(0.5)
    out = m0.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    m1 = DropPath(0.0)
    out = m1.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_drop_path_per_sample_and_rescaled():
    B = 512
    x = jnp.ones((B, 4), jnp.float32)
    rate = 0.3
    out = np.asarray(
        DropPath(rate).apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
    )
    # each sample's row is entirely kept (scaled by 1/keep) or entirely zero
    row_kept = (out != 0).any(-1)
    assert ((out == 0) | np.isclose(out, 1 / (1 - rate))).all()
    assert (out[row_kept] != 0).all()
    # drop fraction near the rate; mean preserved in expectation
    assert abs(row_kept.mean() - (1 - rate)) < 0.08
    assert abs(out.mean() - 1.0) < 0.1


def test_vit_drop_path_train_vs_eval():
    from detectron2_tpu.modeling.backbone.vit import ViT

    vit = ViT(
        img_size=64,
        patch_size=16,
        embed_dim=32,
        depth=2,
        num_heads=2,
        window_size=0,
        drop_path_rate=0.9,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    params = vit.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ev = vit.apply(params, x, train=False)["last_feat"]
    tr = vit.apply(
        params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )["last_feat"]
    # eval is deterministic and differs from a high-rate training pass
    ev2 = vit.apply(params, x, train=False)["last_feat"]
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev2))
    assert not np.allclose(np.asarray(ev), np.asarray(tr))
    # rate=0 training pass equals eval (no other stochastic layers)
    vit0 = vit.clone(drop_path_rate=0.0)
    tr0 = vit0.apply(
        params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )["last_feat"]
    np.testing.assert_allclose(np.asarray(tr0), np.asarray(ev), rtol=1e-6)
