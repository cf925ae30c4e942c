"""LR-schedule parity with the reference (reference tests/test_scheduler.py).

The reference drives a torch optimizer and reads param_groups[0]["lr"] after
each step; our schedules are pure ``step -> lr`` functions, so the same
expected values are asserted on direct calls. The literals below are the
reference test's own expectations (tests/test_scheduler.py:38-73).
"""

import math

import numpy as np
import jax.numpy as jnp

from detectron2_tpu.solver import WarmupCosineLR, WarmupMultiStepLR, build_lr_scheduler
from detectron2_tpu.config import get_cfg


def test_warmup_multistep_exact_values():
    sched = WarmupMultiStepLR(
        base_lr=5.0,
        milestones=[10, 15, 20],
        max_iter=30,
        gamma=0.1,
        warmup_factor=0.001,
        warmup_iters=5,
    )
    lrs = [sched(i) for i in range(31)]
    assert np.allclose(lrs[:5], [0.005, 1.004, 2.003, 3.002, 4.001])
    assert np.allclose(lrs[5:10], 5.0)
    assert np.allclose(lrs[10:15], 0.5)
    assert np.allclose(lrs[15:20], 0.05)
    assert np.allclose(lrs[20:30], 0.005)


def test_warmup_cosine_exact_values():
    sched = WarmupCosineLR(base_lr=5.0, max_iter=30, warmup_factor=0.001, warmup_iters=5)
    for i in range(30):
        expected_cosine = 2.5 * (1.0 + math.cos(math.pi * i / 30))
        if i >= 5:
            assert abs(sched(i) - expected_cosine) < 1e-6, i
        else:
            # warmup region sits below the pure cosine curve
            assert abs(sched(i) - expected_cosine) > 1e-3, i


def test_warmup_cosine_end_value_from_cfg():
    for end in (0.0, 0.5):
        cfg = get_cfg()
        cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
        cfg.SOLVER.MAX_ITER = 100
        cfg.SOLVER.WARMUP_ITERS = 10
        cfg.SOLVER.WARMUP_FACTOR = 0.1
        cfg.SOLVER.BASE_LR = 5.0
        cfg.SOLVER.BASE_LR_END = end
        sched = build_lr_scheduler(cfg)
        assert abs(sched(0) - 5.0 * 0.1) < 1e-6
        assert abs(sched(100) - end) < 1e-6


def test_multistep_ignores_milestones_beyond_max_iter():
    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.STEPS = (60, 80, 10**9)
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.BASE_LR = 1.0
    sched = build_lr_scheduler(cfg)
    assert abs(sched(50) - 1.0) < 1e-6
    assert abs(sched(70) - 0.1) < 1e-6
    assert abs(sched(90) - 0.01) < 1e-6


def test_traced_step_matches_python_step():
    sched = WarmupMultiStepLR(
        base_lr=0.02, milestones=[6, 8], max_iter=10, warmup_factor=0.001, warmup_iters=3
    )
    for i in range(11):
        traced = float(sched(jnp.asarray(i, jnp.int32)))
        assert abs(traced - sched(i)) < 1e-7, i
