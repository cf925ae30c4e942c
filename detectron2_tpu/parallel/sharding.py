"""Parameter-sharding strategies (FSDP / tensor parallelism) via GSPMD.

The reference implements exactly one parallelism strategy — one process per
GPU with NCCL gradient allreduce (DDP; reference detectron2/engine/launch.py,
SURVEY.md §2.12). On TPU the device mesh makes richer layouts a matter of
annotation: this module infers a ``PartitionSpec`` per parameter leaf and
lets XLA's SPMD partitioner insert the collectives —

  - sharding parameters over the **"data"** axis gives ZeRO-3 / FSDP:
    parameters and optimizer state are partitioned across the data-parallel
    replicas, all-gathered on demand for fwd/bwd, and gradients arrive as
    reduce-scatters. Memory per chip drops ~linearly with the axis size.
  - sharding over the **"model"** axis gives Megatron-style tensor
    parallelism: a Dense/conv kernel split on its output-channel dimension
    becomes a column-parallel matmul; GSPMD propagates the resulting
    activation shardings through the graph and inserts the reductions.

No model-code changes are required for either: the rule is purely
shape-based, applied uniformly to the whole TrainState pytree (momentum
buffers mirror their parameters' shapes, so they land on the same layout).
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["infer_leaf_spec", "tree_shardings", "shard_tree", "apply_param_layout"]


def infer_leaf_spec(x: Any, axis_size: int, axis_name: str, min_size: int = 2**13) -> P:
    """Pick the PartitionSpec for one array leaf: shard the largest dimension
    divisible by ``axis_size`` (trailing dim wins ties — for a Dense kernel
    that is the output-channel / column-parallel split), replicate scalars and
    anything smaller than ``min_size`` elements (tiny leaves cost more in
    collective latency than they save in memory)."""
    shape = tuple(getattr(x, "shape", ()))
    size = 1
    for d in shape:
        size *= d
    if not shape or size < min_size:
        return P()
    best = None
    for d in range(len(shape)):
        if shape[d] % axis_size == 0 and (best is None or shape[d] >= shape[best]):
            best = d
    if best is None:
        return P()
    spec: list = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def tree_shardings(tree: Any, mesh: Mesh, axis: str = "data", min_size: int = 2**13) -> Any:
    """NamedSharding pytree for ``tree`` (params or a whole TrainState),
    sharding each leaf over ``axis`` by :func:`infer_leaf_spec`."""
    axis_size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, infer_leaf_spec(x, axis_size, axis, min_size)), tree
    )


def shard_tree(tree: Any, shardings: Any) -> Any:
    """Place a pytree onto devices with a matching pytree of shardings."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def apply_param_layout(layout: str, state: Any, mesh: Mesh) -> tuple:
    """Place a TrainState per the ``cfg.TPU.PARAM_LAYOUT`` string.

    Returns (placed_state, state_shardings) where state_shardings is None for
    the replicated (DDP-equivalent) layout and a NamedSharding pytree
    otherwise — pass it straight to ``make_train_step(state_shardings=...)``.
    """
    if layout == "replicated":
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state), None
    try:
        axis = {"fsdp": "data", "tensor": "model"}[layout]
    except KeyError:
        raise ValueError(
            f"unknown TPU.PARAM_LAYOUT {layout!r}; expected replicated|fsdp|tensor"
        ) from None
    shardings = tree_shardings(state, mesh, axis=axis)
    return shard_tree(state, shardings), shardings
