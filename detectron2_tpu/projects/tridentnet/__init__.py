"""TridentNet (reference projects/TridentNet/tridentnet/): scale-aware trident
blocks — parallel weight-shared branches with different dilations in res4.

TPU-first reformulation: the reference stacks branches into the batch
dimension and duplicates GT per branch; here each branch is exposed as its own
(same-stride) feature level ``res4_b{i}``, so the existing multi-level RPN
unions proposals across branches with no batch surgery, and the ROI heads pool
from the middle branch — the reference's own "fast approximation"
(test_branch_idx=1), which it uses for its headline C4 models at test time.
"""

from detectron2_tpu.projects.tridentnet.config import add_tridentnet_config
from detectron2_tpu.projects.tridentnet.trident_conv import TridentConv
from detectron2_tpu.projects.tridentnet.trident_backbone import (
    TridentBottleneckBlock,
    TridentResNet,
    build_trident_resnet_backbone,
)

__all__ = [
    "add_tridentnet_config",
    "TridentConv",
    "TridentBottleneckBlock",
    "TridentResNet",
    "build_trident_resnet_backbone",
]
