"""Proposal generator registry (reference modeling/proposal_generator/build.py)."""

from detectron2_tpu.utils.registry import Registry

PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")
"""Registry for proposal generators (produce object proposals from features)."""

__all__ = ["PROPOSAL_GENERATOR_REGISTRY", "build_proposal_generator"]


def build_proposal_generator(cfg, input_shape):
    """Build from `cfg.MODEL.PROPOSAL_GENERATOR.NAME`."""
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "PrecomputedProposals":
        return None
    cls = PROPOSAL_GENERATOR_REGISTRY.get(name)
    if hasattr(cls, "from_config"):
        return cls.from_config(cfg, input_shape)
    return cls(cfg, input_shape)
