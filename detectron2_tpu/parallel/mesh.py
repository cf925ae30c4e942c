"""Device mesh + sharding utilities.

TPU-native replacement for the reference's process-based DDP launch
(detectron2/engine/launch.py + utils/comm.py, SURVEY.md §2.12): instead of one
process per device with NCCL allreduce, a single controller jit-compiles the
train step over a ``jax.sharding.Mesh``; gradients are reduced by the psum XLA
inserts for the ("data",) batch sharding, riding ICI.

Axes:
  - "data":  batch dimension (data parallelism; gradient reduction).
  - "model": reserved for tensor parallelism of large backbones (ViT-H).
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding", "shard_batch", "replicate", "local_mesh_devices"]


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    Args:
        data: data-parallel axis size; -1 = all remaining devices.
        model: model-parallel axis size.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the batch dimension."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the leading (batch)
    axis. Batch size must be divisible by the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_mesh_devices(n: int) -> Sequence[jax.Device]:
    devices = jax.devices()
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return devices[:n]
