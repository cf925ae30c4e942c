from detectron2_tpu.modeling.proposal_generator.build import (
    PROPOSAL_GENERATOR_REGISTRY,
    build_proposal_generator,
)
from detectron2_tpu.modeling.proposal_generator.proposal_utils import (
    add_ground_truth_to_proposals_padded,
    find_top_rpn_proposals_padded,
)
from detectron2_tpu.modeling.proposal_generator.rpn import (
    RPN,
    RPN_HEAD_REGISTRY,
    StandardRPNHead,
    build_rpn_head,
)
from detectron2_tpu.modeling.proposal_generator.rrpn import RRPN

__all__ = [k for k in globals().keys() if not k.startswith("_")]
