"""Composable optimizers (analogue of reference configs/common/optim.py),
built on optax with d2 parameter-group semantics."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.solver.build import adamw_with_param_groups, sgd_with_param_groups

SGD = L(sgd_with_param_groups)(
    lr_schedule=0.02,
    momentum=0.9,
    weight_decay=1e-4,
    weight_decay_norm=0.0,
)

AdamW = L(adamw_with_param_groups)(
    lr_schedule=1e-4,
    betas=(0.9, 0.999),
    weight_decay=0.1,
    weight_decay_norm=0.0,
)
