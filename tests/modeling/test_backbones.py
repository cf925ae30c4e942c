"""Shape/contract tests for the Swin / MViT / RegNet backbones (the role of
reference tests/modeling/test_backbone.py): every out_feature must exist with
the channels/stride its output_shape() declares, and gradients must flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.modeling.backbone.mvit import MViT
from detectron2_tpu.modeling.backbone.regnet import RegNet
from detectron2_tpu.modeling.backbone.swin import SwinTransformer


def _check_backbone(model, H=64, W=64, train=False):
    x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, train=train)
    outs = model.apply(params, x, train=train)
    shapes = model.output_shape()
    assert set(outs.keys()) == set(shapes.keys()) == set(model.out_features)
    for name, spec in shapes.items():
        o = outs[name]
        assert o.shape[-1] == spec.channels, (name, o.shape, spec)
        assert o.shape[1] == H // spec.stride, (name, o.shape, spec)
        assert o.shape[2] == W // spec.stride, (name, o.shape, spec)
        assert np.isfinite(np.asarray(o)).all(), name
    return params, outs


def test_swin_tiny_shapes():
    # Swin-T-ish, shrunk: depths (1,1,2,1), dim 32
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
    _check_backbone(model)
    # channels double per stage from embed_dim
    shapes = model.output_shape()
    chans = [shapes[f"p{i}"].channels for i in range(4)]
    assert chans == [32, 64, 128, 256]


def test_mvit_tiny_shapes():
    model = MViT(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))
    _check_backbone(model)
    shapes = model.output_shape()
    assert [shapes[f"scale{i}"].stride for i in range(2, 6)] == [4, 8, 16, 32]


def test_regnet_shapes_and_param_budget():
    # RegNetX-200MF (reference regnet builder params): 4 stages, widths
    # [24, 56, 152, 368] after group-width compatibility adjustment.
    model = RegNet(
        w_a=36.44, w_0=24, w_m=2.49, depth=13, group_width=8, norm="BN",
    )
    params, _ = _check_backbone(model)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 1e5 < n < 5e7  # a real network, not a stub


def test_regnet_y_has_se():
    model = RegNet(w_a=24.48, w_0=24, w_m=2.54, depth=6, group_width=16, se_ratio=0.25, norm="BN")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("se" in n.lower() for n in names), "RegNetY must have SE blocks"


def test_swin_gradients_flow():
    model = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(1, 2), out_features=("p0", "p1"))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss(p):
        outs = model.apply(p, x, train=True)
        return sum((o**2).mean() for o in outs.values())

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
