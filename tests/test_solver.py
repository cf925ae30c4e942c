"""Optimizer-build semantics (reference tests/test_solver.py + the per-group
policy of solver/build.py get_default_optimizer_params:142-281).

Torch SGD semantics to preserve: update = -lr * buf, buf = momentum*buf +
(grad + wd*param); norm params get WEIGHT_DECAY_NORM, biases get
BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from detectron2_tpu.config import get_cfg
from detectron2_tpu.solver import (
    build_optimizer,
    get_param_labels,
    maybe_add_gradient_clipping,
    sgd_with_param_groups,
)


def _params():
    return {
        "backbone": {
            "conv1": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
            "GroupNorm_0": {"scale": jnp.ones((3,)), "bias": jnp.ones((3,))},
        }
    }


def test_param_labels():
    labels = get_param_labels(_params())
    assert labels["backbone"]["conv1"]["kernel"] == "default"
    assert labels["backbone"]["conv1"]["bias"] == "bias"
    # everything under a norm scope is "norm", including its bias
    assert labels["backbone"]["GroupNorm_0"]["scale"] == "norm"
    assert labels["backbone"]["GroupNorm_0"]["bias"] == "norm"


def test_sgd_matches_torch_formula():
    lr, momentum, wd = 0.1, 0.9, 0.01
    params = _params()
    opt = sgd_with_param_groups(
        lambda s: lr,
        momentum=momentum,
        weight_decay=wd,
        weight_decay_norm=0.0,
        weight_decay_bias=0.0,
        param_labels=get_param_labels(params),
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)

    p, buf = 1.0, 0.0
    for step in range(3):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # hand-rolled torch SGD on the "default"-group scalar
        buf = momentum * buf + (0.5 + wd * p)
        p = p - lr * buf
        np.testing.assert_allclose(params["backbone"]["conv1"]["kernel"][0, 0], p, rtol=1e-6)

    # norm/bias groups got zero weight decay: their trajectory is the wd=0 one
    q, bufq = 1.0, 0.0
    for step in range(3):
        bufq = momentum * bufq + 0.5
        q = q - lr * bufq
    np.testing.assert_allclose(params["backbone"]["GroupNorm_0"]["scale"][0], q, rtol=1e-6)
    np.testing.assert_allclose(params["backbone"]["conv1"]["bias"][0], q, rtol=1e-6)


def test_bias_lr_factor():
    params = _params()
    opt = sgd_with_param_groups(
        lambda s: 0.1,
        momentum=0.0,
        weight_decay=0.0,
        bias_lr_factor=2.0,
        param_labels=get_param_labels(params),
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(updates["backbone"]["conv1"]["kernel"][0, 0], -0.1, rtol=1e-6)
    np.testing.assert_allclose(updates["backbone"]["conv1"]["bias"][0], -0.2, rtol=1e-6)


def test_gradient_clipping_norm_and_value():
    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    params = {"w": jnp.zeros((2,))}
    opt = maybe_add_gradient_clipping(cfg, optax.sgd(1.0))
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.asarray([3.0, 4.0])}, state, params)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(updates["w"])), 1.0, rtol=1e-5)

    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.5
    opt = maybe_add_gradient_clipping(cfg, optax.sgd(1.0))
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.asarray([3.0, -4.0])}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.5, 0.5], rtol=1e-6)


def test_build_optimizer_from_cfg_runs():
    cfg = get_cfg()
    cfg.SOLVER.MAX_ITER = 10
    cfg.SOLVER.WARMUP_ITERS = 2
    params = _params()
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)
