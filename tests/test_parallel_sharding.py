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


@pytest.mark.slow
def test_full_model_2d_mesh_matches_replicated():
    """The FULL detection model (tiny R18-FPN Mask R-CNN: backbone, RPN+NMS,
    matching/sampling, box+mask heads) trains one step under fsdp and a 2D
    data x model tensor-parallel mesh, matching the replicated-dp numbers.

    The toy-MLP test below validates the sharding machinery; this one pins
    the GeneralizedRCNN train step itself, so a TP regression is caught by
    pytest and not only by the driver's dryrun_multichip."""
    from __graft_entry__ import _dryrun_cfg, _make_batch
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.solver import build_optimizer

    cfg = _dryrun_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU mesh
    cfg.SOLVER.MAX_ITER = 10
    model = build_model(cfg)

    B = 4
    batch_host = _make_batch(B, 64, 64, G=2, train=True, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batch_host),
        train=True,
    )
    state0 = TrainState.create(params, build_optimizer(cfg, params))

    def run(layout, mesh):
        st, shardings = apply_param_layout(layout, state0, mesh)
        bt = shard_batch(batch_host, mesh)
        step = make_train_step(model, mesh=mesh, donate=False, state_shardings=shardings)
        rng = jax.device_put(jax.random.PRNGKey(42), jax.sharding.NamedSharding(mesh, P()))
        st, losses = step(st, bt, rng)
        total = float(losses["total_loss"])
        assert np.isfinite(total), losses
        return total, st

    mesh_dp = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    mesh_2d = create_mesh(data=2, model=2, devices=jax.devices()[:4])

    dp_total, dp_state = run("replicated", mesh_dp)
    fsdp_total, _ = run("fsdp", mesh_dp)
    tp_total, tp_state = run("tensor", mesh_2d)

    np.testing.assert_allclose(fsdp_total, dp_total, rtol=1e-3)
    np.testing.assert_allclose(tp_total, dp_total, rtol=1e-3)

    # the tp layout must actually partition real model weights over "model"
    leaves = jax.tree_util.tree_leaves(tp_state.params)
    assert any(
        hasattr(x, "sharding") and "model" in tuple(getattr(x.sharding, "spec", ()) or ())
        for x in leaves
    ), "no parameter sharded over the model axis"

    # updated parameters agree leaf-for-leaf with the replicated run
    for a, b in zip(jax.tree_util.tree_leaves(dp_state.params), leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


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


def test_sharded_inference_matches_single_device():
    """SPMD eval path (make_eval_step): the FULL detection model's padded
    detections under a 4-device dp mesh — with replicated AND fsdp-sharded
    parameters — must equal the single-device jit output, and the padded ->
    Instances host conversion must agree detection-for-detection.

    Closes the round-3 gap: dryrun_multichip and the tests above exercise
    only the TRAIN step; the eval step's in/out shardings were never pinned.
    """
    from __graft_entry__ import _dryrun_cfg, _make_batch

    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.modeling.postprocessing import detector_postprocess
    from detectron2_tpu.parallel import make_eval_step

    cfg = _dryrun_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU mesh
    model = build_model(cfg)

    B, H, W = 4, 64, 64
    batch_host = _make_batch(B, H, W, G=2, train=False, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batch_host),
        train=False,
    )

    # single device
    out_single = make_eval_step(model)(params, batch_host)
    out_single = {k: np.asarray(v) for k, v in out_single.items()}

    mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
    batch_sh = shard_batch(batch_host, mesh)

    # replicated params over the dp mesh
    repl = jax.sharding.NamedSharding(mesh, P())
    params_repl = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
    out_dp = make_eval_step(model, mesh=mesh)(params_repl, batch_sh)

    # fsdp-sharded params over the same mesh
    shardings = tree_shardings(params, mesh, axis="data")
    params_fsdp = shard_tree(params, shardings)
    out_fsdp = make_eval_step(model, mesh=mesh, param_shardings=shardings)(
        params_fsdp, batch_sh
    )

    for name, out in (("dp", out_dp), ("fsdp", out_fsdp)):
        for k, v in out_single.items():
            got = np.asarray(out[k])
            assert got.shape == v.shape, (name, k, got.shape, v.shape)
            if got.dtype == bool or np.issubdtype(got.dtype, np.integer):
                np.testing.assert_array_equal(got, v, err_msg=f"{name}:{k}")
            else:
                # mesh-compiled and single-device programs fuse reductions in
                # different orders; observed worst case 1.3e-3 abs on box
                # coords (f32), so gate at 5e-3
                np.testing.assert_allclose(got, v, atol=5e-3, rtol=1e-3, err_msg=f"{name}:{k}")

    # padded -> Instances host conversion agrees per image
    for b in range(B):
        inst_s = detector_postprocess(
            {k: v[b] for k, v in out_single.items()}, H, W, H, W
        )
        inst_m = detector_postprocess(
            {k: np.asarray(v)[b] for k, v in out_dp.items()}, H, W, H, W
        )
        assert len(inst_s) == len(inst_m)
        if len(inst_s):
            np.testing.assert_allclose(
                inst_s.pred_boxes.tensor, inst_m.pred_boxes.tensor, atol=5e-3
            )
            np.testing.assert_array_equal(inst_s.pred_classes, inst_m.pred_classes)
