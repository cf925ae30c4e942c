"""FSDP / tensor-parallel parameter sharding on the 8-device CPU mesh.

The reference only has DDP (replicated params, gradient allreduce); these
layouts are TPU-native extensions. Each sharded step must (a) really
partition the state across devices and (b) produce the same numbers as the
replicated data-parallel step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from detectron2_tpu.parallel import (
    TrainState,
    apply_param_layout,
    create_mesh,
    infer_leaf_spec,
    make_train_step,
    replicate,
    shard_batch,
    shard_tree,
    tree_shardings,
)


class _MLP(nn.Module):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        h = nn.Dense(256)(batch["x"])
        h = nn.relu(h)
        pred = nn.Dense(1)(h)[..., 0]
        if train:
            return {"loss_mse": ((pred - batch["y"]) ** 2).mean()}
        return pred


def _setup(mesh):
    model = _MLP()
    rng = np.random.RandomState(0)
    x = rng.rand(8, 64).astype(np.float32)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray((x * 0.3).sum(-1))}
    params = model.init(jax.random.PRNGKey(0), batch, train=True)
    state = TrainState.create(params, optax.sgd(0.1, momentum=0.9))
    batch = shard_batch(batch, mesh)
    return model, state, batch


def _run_replicated(model, state, batch, mesh, steps=3):
    step = make_train_step(model, mesh=mesh, donate=False)
    state = replicate(state, mesh)
    rng = jax.device_put(jax.random.PRNGKey(7), jax.sharding.NamedSharding(mesh, P()))
    for _ in range(steps):
        state, losses = step(state, batch, rng)
    return state, losses


def _run_sharded(model, state, batch, mesh, axis, steps=3):
    shardings = tree_shardings(state, mesh, axis=axis, min_size=64)
    state = shard_tree(state, shardings)
    step = make_train_step(model, mesh=mesh, donate=False, state_shardings=shardings)
    rng = jax.device_put(jax.random.PRNGKey(7), jax.sharding.NamedSharding(mesh, P()))
    for _ in range(steps):
        state, losses = step(state, batch, rng)
    return state, losses


def test_apply_param_layout():
    """The cfg.TPU.PARAM_LAYOUT dispatch used by DefaultTrainer."""
    mesh = create_mesh(data=8, model=1)
    model, state, _ = _setup(mesh)

    st, sh = apply_param_layout("replicated", state, mesh)
    assert sh is None
    assert st.params["params"]["Dense_0"]["kernel"].sharding.spec == P()

    st, sh = apply_param_layout("fsdp", state, mesh)
    assert sh is not None
    assert "data" in tuple(st.params["params"]["Dense_0"]["kernel"].sharding.spec)

    with pytest.raises(ValueError, match="PARAM_LAYOUT"):
        apply_param_layout("zero_infinity", state, mesh)


def test_infer_leaf_spec():
    axis = "data"
    # largest divisible dim wins; trailing dim wins ties
    assert infer_leaf_spec(jnp.zeros((64, 256)), 8, axis, min_size=1) == P(None, axis)
    assert infer_leaf_spec(jnp.zeros((256, 64)), 8, axis, min_size=1) == P(axis, None)
    assert infer_leaf_spec(jnp.zeros((128, 128)), 8, axis, min_size=1) == P(None, axis)
    # indivisible or tiny leaves replicate
    assert infer_leaf_spec(jnp.zeros((7, 9)), 8, axis, min_size=1) == P()
    assert infer_leaf_spec(jnp.zeros(()), 8, axis) == P()
    assert infer_leaf_spec(jnp.zeros((256,)), 8, axis, min_size=2**13) == P()


@pytest.mark.parametrize("axis,mesh_shape", [("data", (8, 1)), ("model", (4, 2))])
def test_sharded_step_matches_replicated(axis, mesh_shape):
    mesh = create_mesh(data=mesh_shape[0], model=mesh_shape[1])
    model, state0, batch = _setup(mesh)

    ref_state, ref_losses = _run_replicated(model, state0, batch, mesh)
    sh_state, sh_losses = _run_sharded(model, state0, batch, mesh, axis)

    np.testing.assert_allclose(
        float(ref_losses["total_loss"]), float(sh_losses["total_loss"]), rtol=1e-5
    )
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    sh_leaves = jax.tree_util.tree_leaves(sh_state.params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    # the big Dense kernel must actually be partitioned over the axis
    kernel = sh_state.params["params"]["Dense_0"]["kernel"]
    spec = kernel.sharding.spec
    assert axis in tuple(spec), f"Dense_0 kernel not sharded: {spec}"
    n_shards = len({d for shard in kernel.addressable_shards for d in [shard.device]})
    assert n_shards == mesh.devices.size
    expected = kernel.size // mesh.shape[axis]
    assert kernel.addressable_shards[0].data.size == expected
    # momentum mirrors the param layout
    mom = jax.tree_util.tree_leaves(
        sh_state.opt_state, is_leaf=lambda x: hasattr(x, "sharding")
    )
    assert any(
        getattr(m, "shape", None) == kernel.shape and axis in tuple(m.sharding.spec)
        for m in mom
        if hasattr(m, "sharding")
    )
