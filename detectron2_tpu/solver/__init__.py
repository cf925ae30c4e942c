from detectron2_tpu.solver.build import (
    build_lr_scheduler,
    build_optimizer,
    get_param_labels,
    maybe_add_gradient_clipping,
    sgd_with_param_groups,
)
from detectron2_tpu.solver.lr_scheduler import (
    ConstantParamScheduler,
    CosineParamScheduler,
    ExponentialParamScheduler,
    LinearParamScheduler,
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupCosineLR,
    WarmupMultiStepLR,
    WarmupParamScheduler,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
