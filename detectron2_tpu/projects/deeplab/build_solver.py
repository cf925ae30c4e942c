"""Poly LR schedule for DeepLab (reference projects/DeepLab/deeplab/build_solver.py
and lr_scheduler.py WarmupPolyLR)."""

from detectron2_tpu.solver.lr_scheduler import LRMultiplier, ParamScheduler, WarmupParamScheduler
from detectron2_tpu.solver.build import build_lr_scheduler as _base_build_lr_scheduler


class PolyParamScheduler(ParamScheduler):
    """multiplier = (1 - where)^power, with an optional constant tail."""

    def __init__(self, power: float = 0.9, constant_ending: float = 0.0):
        self._power = power
        self._constant_ending = constant_ending

    def __call__(self, where: float) -> float:
        val = (1 - min(where, 1.0)) ** self._power
        if self._constant_ending > 0 and val < self._constant_ending:
            return self._constant_ending
        return val


def WarmupPolyLR(
    base_lr: float,
    max_iter: int,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
    power: float = 0.9,
    constant_ending: float = 0.0,
) -> LRMultiplier:
    sched = PolyParamScheduler(power, constant_ending)
    sched = WarmupParamScheduler(sched, warmup_factor, min(warmup_iters / max_iter, 1.0), warmup_method)
    return LRMultiplier(sched, max_iter, base_lr)


def build_lr_scheduler(cfg, base_lr=None) -> LRMultiplier:
    """Like solver.build_lr_scheduler but adding WarmupPolyLR."""
    if cfg.SOLVER.LR_SCHEDULER_NAME == "WarmupPolyLR":
        return WarmupPolyLR(
            base_lr if base_lr is not None else cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
            power=cfg.SOLVER.POLY_LR_POWER,
            constant_ending=cfg.SOLVER.POLY_LR_CONSTANT_ENDING,
        )
    return _base_build_lr_scheduler(cfg, base_lr)
