"""Meta-architecture registry + build_model (reference modeling/meta_arch/build.py:16-25)."""

from detectron2_tpu.utils.logger import _log_api_usage
from detectron2_tpu.utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")
"""Registry for meta-architectures: whole models taking preprocessed batches."""

__all__ = ["META_ARCH_REGISTRY", "build_model"]


def build_model(cfg):
    """Build the whole model architecture from
    ``cfg.MODEL.META_ARCHITECTURE``. Returns a flax module (parameters live
    outside; device placement follows jax shardings, so there is no
    ``.to(device)`` step)."""
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    model = META_ARCH_REGISTRY.get(meta_arch).from_config(cfg)
    _log_api_usage("modeling.meta_arch." + meta_arch)
    return model
