"""TensorMask (reference projects/TensorMask/tensormask/): dense sliding-
window instance segmentation with the tensor bipyramid.

``swap_align2nat`` — the reference's only CUDA kernel
(csrc/SwapAlign2Nat/) — is a pure-XLA vectorized quadrilinear gather with
identical semantics (layers.py); the meta-architecture (arch.py) is the
fixed-shape TPU redesign of the reference's arch.py. Importing this package
registers ``TensorMask`` into META_ARCH_REGISTRY.
"""

from detectron2_tpu.projects.tensormask.arch import (
    TensorMask,
    TensorMaskHead,
    tensormask_assignment,
)
from detectron2_tpu.projects.tensormask.config import add_tensormask_config
from detectron2_tpu.projects.tensormask.layers import SwapAlign2Nat, swap_align2nat

__all__ = [
    "add_tensormask_config",
    "TensorMask",
    "TensorMaskHead",
    "tensormask_assignment",
    "swap_align2nat",
    "SwapAlign2Nat",
]
