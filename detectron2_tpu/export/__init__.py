"""Model export / deployment.

The reference's export stack (detectron2/export/: TracingAdapter, TorchScript
scripting, the deprecated Caffe2 path) solves a torch-specific problem —
making python models traceable. In this framework every model is already a
pure jittable function of fixed-shape arrays, so export is first-class:

- :func:`aot_compile` — ahead-of-time compile a model for specific shapes and
  serialize the executable (jax AOT; the TorchScript analogue).
- :func:`export_stablehlo` — serialize to StableHLO via jax.export for
  framework-independent deployment (the ONNX analogue).
- :func:`save_compiled` / :func:`load_compiled` — persist the compiled PJRT
  executable itself, so a serving process starts with ZERO compilation (the
  self-contained-artifact role of the reference's caffe2 deploy path).
- :class:`TracingAdapter` — API-parity shim flattening batch-dict I/O to a
  tensor-only signature.
"""

from detectron2_tpu.export.api import (
    TracingAdapter,
    aot_compile,
    export_stablehlo,
    load_compiled,
    load_stablehlo,
    save_compiled,
)

__all__ = [
    "TracingAdapter",
    "aot_compile",
    "export_stablehlo",
    "load_stablehlo",
    "save_compiled",
    "load_compiled",
]
