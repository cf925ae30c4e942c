"""TensorMask (reference projects/TensorMask/tensormask/).

Round-1 scope: the core native op ``swap_align2nat`` — the reference's only
CUDA kernel (csrc/SwapAlign2Nat/), here a pure-XLA vectorized quadrilinear
gather with identical semantics — plus its module wrapper. The full tensor
bipyramid meta-architecture is scheduled for a later round and documented in
PROGRESS.md.
"""

from detectron2_tpu.projects.tensormask.layers import SwapAlign2Nat, swap_align2nat

__all__ = ["swap_align2nat", "SwapAlign2Nat"]
