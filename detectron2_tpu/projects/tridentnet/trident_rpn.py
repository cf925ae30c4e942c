"""Trident RPN (reference projects/TridentNet/tridentnet/trident_rpn.py).

The reference duplicates the image batch once per branch and runs RPN on the
3x batch; here the branches are exposed by TridentResNet as same-stride
feature levels (res4_b0..b{N-1}), so training runs the standard multi-level
RPN over them. In the fast approximation (TEST_BRANCH_IDX != -1) the
reference switches to a single branch at inference (trident_rpn.py:25); this
subclass does the same by restricting the eval-time feature set to the
aliased "res4" (= the test branch)."""

from typing import Tuple

from detectron2_tpu.modeling.proposal_generator.build import PROPOSAL_GENERATOR_REGISTRY
from detectron2_tpu.modeling.proposal_generator.rpn import RPN

__all__ = ["TridentRPN"]


@PROPOSAL_GENERATOR_REGISTRY.register()
class TridentRPN(RPN):
    test_in_features: Tuple[str, ...] = ("res4",)
    trident_fast: bool = True

    @classmethod
    def from_config(cls, cfg, input_shape):
        base = RPN.from_config.__func__(cls, cfg, input_shape)
        return base.clone(
            test_in_features=("res4",),
            trident_fast=cfg.MODEL.TRIDENT.TEST_BRANCH_IDX != -1,
        )

    def _select_in_features(self, train: bool) -> Tuple[str, ...]:
        if not train and self.trident_fast:
            return self.test_in_features
        return self.in_features
