"""TridentNet (reference projects/TridentNet/tridentnet/): scale-aware trident
blocks — parallel weight-shared branches with different dilations in res4.

TPU-first reformulation: the reference stacks branches into the batch
dimension and duplicates GT per branch; here each branch is exposed as its own
(same-stride) feature level ``res4_b{i}``, so at train the multi-level RPN
unions proposals across branches with no batch surgery, and the ROI heads pool
from the middle branch. At inference in the fast approximation
(test_branch_idx=1 — what the reference uses for its headline C4 models)
``TridentRPN`` restricts itself to the single test branch, exactly matching
the reference's single-branch test path (trident_rpn.py:25) — pinned by
tests/parity/test_e2e_tridentnet_golden.py.
"""

from detectron2_tpu.projects.tridentnet.config import add_tridentnet_config
from detectron2_tpu.projects.tridentnet.trident_conv import TridentConv
from detectron2_tpu.projects.tridentnet.trident_backbone import (
    TridentBottleneckBlock,
    TridentResNet,
    build_trident_resnet_backbone,
)
from detectron2_tpu.projects.tridentnet.trident_rpn import TridentRPN

__all__ = [
    "add_tridentnet_config",
    "TridentConv",
    "TridentBottleneckBlock",
    "TridentResNet",
    "build_trident_resnet_backbone",
    "TridentRPN",
]
