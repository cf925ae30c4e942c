"""Export implementations (replaces reference detectron2/export/:
flatten.py TracingAdapter, torchscript.py, caffe2 path)."""

import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

__all__ = [
    "TracingAdapter",
    "aot_compile",
    "export_stablehlo",
    "load_stablehlo",
    "save_compiled",
    "load_compiled",
]


class TracingAdapter:
    """Flatten dict-structured model I/O into a tensor tuple signature
    (reference export/flatten.py:186). jax pytrees make this mechanical:
    the schema is the treedef."""

    def __init__(self, model_apply: Callable, inputs: Dict[str, Any]):
        """
        Args:
            model_apply: (batch_dict) -> output pytree.
            inputs: an example batch dict.
        """
        self.model = model_apply
        flat, self.inputs_schema = jax.tree_util.tree_flatten(inputs)
        self.flattened_inputs = tuple(flat)
        self.outputs_schema = None

    def __call__(self, *args):
        batch = jax.tree_util.tree_unflatten(self.inputs_schema, list(args))
        out = self.model(batch)
        flat_out, schema = jax.tree_util.tree_flatten(out)
        if self.outputs_schema is None:
            self.outputs_schema = schema
        return tuple(flat_out)


def export_stablehlo(model_apply: Callable, example_batch: Dict[str, Any], path: Optional[str] = None):
    """Serialize the jitted model to StableHLO bytes via jax.export — a
    framework-independent deployable artifact (the reference's ONNX-export
    analogue, export/torchscript.py)."""
    from jax import export as jax_export

    fn = jax.jit(model_apply)
    shapes = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_batch)
    exported = jax_export.export(fn)(shapes)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
        logger.info("Serialized StableHLO export (%d bytes) to %s", len(blob), path)
    return blob


def load_stablehlo(path_or_bytes):
    """Deserialize a StableHLO artifact written by export_stablehlo and
    return a callable executing it on the local PJRT backend. The artifact
    carries the input/output pytree structure, so the callable takes the
    same batch dict the original model did."""
    from jax import export as jax_export

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytearray(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = bytearray(f.read())
    restored = jax_export.deserialize(blob)
    return restored.call


def aot_compile(model_apply: Callable, example_batch: Dict[str, Any]):
    """Ahead-of-time compile for the example batch's shapes; returns the
    compiled executable (callable). Eliminates first-call compilation in
    serving processes; pairs with jax's persistent compilation cache."""
    fn = jax.jit(model_apply)
    shapes = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_batch)
    lowered = fn.lower(shapes)
    compiled = lowered.compile()
    logger.info(
        "AOT compiled: %s FLOPs estimated", compiled.cost_analysis().get("flops", "n/a") if compiled.cost_analysis() else "n/a"
    )
    return compiled


def save_compiled(compiled, path: str) -> None:
    """Persist an AOT-compiled executable (`aot_compile`'s return) to disk.

    This is the deploy story the reference's caffe2/torchscript exports
    served (a self-contained serving artifact): the file carries the
    device-specific PJRT executable plus the input/output pytree structure,
    so a serving process `load_compiled`s it and runs inference with ZERO
    compilation (vs aot_compile, which still compiles once per process, or
    StableHLO exports, which re-compile at load). Executable blobs are
    topology- and compiler-version-specific — regenerate per fleet rollout.

    TRUST BOUNDARY: the artifact is a pickle. `load_compiled` of an
    untrusted .jaxexec is arbitrary code execution — treat these files like
    binaries (sign/verify in deployment), never load ones you didn't write.
    """
    import pickle

    from jax.experimental import serialize_executable

    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    # record how many devices the executable was compiled for: the loader
    # must hand deserialize_and_load exactly that many execution devices
    # (its default is ALL addressable devices, which breaks a single-device
    # serving executable on a multi-device host)
    num_devices = None
    for probe in (
        lambda: len(compiled._executable.local_devices()),  # public-shaped, newer jax
        lambda: len(compiled._executable.xla_executable.local_devices()),
    ):
        try:
            num_devices = probe()
            break
        except Exception:
            continue
    if num_devices is None:
        num_devices = 1
        logger.warning(
            "Could not introspect the executable's device count (JAX internals "
            "moved?); recording num_devices=1. If this executable was compiled "
            "for multiple devices, pass devices= explicitly to load_compiled."
        )
    with open(path, "wb") as f:
        pickle.dump(
            {
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "num_devices": num_devices,
            },
            f,
        )
    logger.info("Serialized compiled executable (%d-device) to %s", num_devices, path)


def load_compiled(path: str, devices=None):
    """Load an executable written by `save_compiled`; returns the compiled
    callable with the original (pytree) calling convention.

    TRUST BOUNDARY: .jaxexec files are pickles — loading one executes
    arbitrary code. Only load artifacts you produced (see `save_compiled`).

    Args:
        devices: execution devices; defaults to the first N local devices,
            N = the device count recorded at save time.
    """
    import pickle

    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if devices is None:
        devices = jax.devices()[: blob.get("num_devices", 1)]
    return serialize_executable.deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"], execution_devices=devices
    )
