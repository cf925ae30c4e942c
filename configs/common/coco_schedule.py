"""Common COCO LR schedules (analogue of reference configs/common/coco_schedule.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)


def default_X_scheduler(num_X: float, base_lr: float = 0.02):
    """d2's "1x" = 90k iterations at batch 16; decays at 2/3rds points."""
    total_steps_16bs = int(num_X * 90000 / 100) * 100
    if num_X <= 2:
        scheduler = MultiStepParamScheduler(
            values=[1.0, 0.1, 0.01],
            milestones=[total_steps_16bs - 60000 // 2, total_steps_16bs - 20000 // 2, total_steps_16bs]
            if num_X == 0.5
            else [total_steps_16bs - 60000, total_steps_16bs - 20000, total_steps_16bs],
            num_updates=total_steps_16bs,
        )
    else:
        scheduler = MultiStepParamScheduler(
            values=[1.0, 0.1, 0.01],
            milestones=[total_steps_16bs - 60000, total_steps_16bs - 20000, total_steps_16bs],
            num_updates=total_steps_16bs,
        )
    warmup = WarmupParamScheduler(scheduler, warmup_factor=0.001, warmup_length=1000 / total_steps_16bs)
    return LRMultiplier(warmup, max_iter=total_steps_16bs, base_lr=base_lr)


lr_multiplier_1x = L(default_X_scheduler)(num_X=1)
lr_multiplier_2x = L(default_X_scheduler)(num_X=2)
lr_multiplier_3x = L(default_X_scheduler)(num_X=3)
