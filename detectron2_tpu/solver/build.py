"""Optimizer and LR-scheduler builders on optax.

Parity with reference detectron2/solver/build.py: SGD with momentum and the
per-parameter-group policy of ``get_default_optimizer_params`` (:142-281) —
norm parameters get ``WEIGHT_DECAY_NORM``, biases get
``BIAS_LR_FACTOR`` / ``WEIGHT_DECAY_BIAS`` — expressed as optax masks, plus
the gradient-clipping wrapper (:29-117). Torch SGD semantics are preserved:
update = -lr * momentum_buffer(grad + wd * param).
"""

from typing import Any, Callable, Dict, Optional

import jax
import optax

from detectron2_tpu.solver.lr_scheduler import LRMultiplier, WarmupCosineLR, WarmupMultiStepLR

__all__ = ["build_optimizer", "build_lr_scheduler", "get_param_labels", "sgd_with_param_groups", "adamw_with_param_groups", "maybe_add_gradient_clipping"]

_NORM_MARKERS = ("Norm",)  # FrozenBatchNorm2d / BatchNorm / GroupNorm / LayerNorm scopes


def get_param_labels(params) -> Any:
    """Label each parameter leaf 'norm', 'bias', or 'default' by its flax path
    (the functional analogue of reference get_default_optimizer_params)."""

    def label(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        # non-trainable collections (EMA meters, batch statistics): zero-grad
        # leaves that must never receive weight decay
        if keys and keys[0] in ("meters", "batch_stats", "frozen"):
            return "norm"
        if any(any(m in k for m in _NORM_MARKERS) for k in keys):
            return "norm"
        if keys and keys[-1] in ("bias",):
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _const_schedule(lr: float) -> Callable:
    return lambda step: lr


def adamw_with_param_groups(
    lr_schedule,
    betas: tuple = (0.9, 0.999),
    weight_decay: float = 0.1,
    weight_decay_norm: float = 0.0,
    weight_decay_bias: Optional[float] = None,
    param_labels=None,
) -> optax.GradientTransformation:
    """AdamW with d2's parameter groups (the lazy-config optimizer analogue
    of reference configs/common/optim.py AdamW)."""
    if weight_decay_bias is None:
        weight_decay_bias = weight_decay
    if not callable(lr_schedule):
        lr_schedule = _const_schedule(lr_schedule)

    def wd_mask(group, wd):
        return optax.masked(
            optax.add_decayed_weights(wd),
            jax.tree_util.tree_map(lambda l: l == group, param_labels),
        )

    transforms = [optax.scale_by_adam(b1=betas[0], b2=betas[1])]
    if param_labels is not None:
        transforms += [
            wd_mask("default", weight_decay),
            wd_mask("norm", weight_decay_norm),
            wd_mask("bias", weight_decay_bias),
        ]
    else:
        transforms.append(optax.add_decayed_weights(weight_decay))
    transforms.append(optax.scale_by_schedule(lambda step: -lr_schedule(step)))
    return optax.chain(*transforms)


def sgd_with_param_groups(
    lr_schedule: Callable,
    momentum: float = 0.9,
    nesterov: bool = False,
    weight_decay: float = 1e-4,
    weight_decay_norm: float = 0.0,
    weight_decay_bias: Optional[float] = None,
    bias_lr_factor: float = 1.0,
    param_labels=None,
) -> optax.GradientTransformation:
    """Torch-style SGD with d2's parameter groups."""
    if weight_decay_bias is None:
        weight_decay_bias = weight_decay
    if not callable(lr_schedule):
        lr_schedule = _const_schedule(lr_schedule)

    def wd_mask(group, wd):
        return optax.masked(
            optax.add_decayed_weights(wd),
            jax.tree_util.tree_map(lambda l: l == group, param_labels),
        )

    transforms = []
    if param_labels is not None:
        transforms += [
            wd_mask("default", weight_decay),
            wd_mask("norm", weight_decay_norm),
            wd_mask("bias", weight_decay_bias),
        ]
    else:
        transforms.append(optax.add_decayed_weights(weight_decay))

    transforms.append(optax.trace(decay=momentum, nesterov=nesterov))
    transforms.append(optax.scale_by_schedule(lambda step: -lr_schedule(step)))
    if param_labels is not None and bias_lr_factor != 1.0:
        transforms.append(
            optax.masked(
                optax.scale(bias_lr_factor),
                jax.tree_util.tree_map(lambda l: l == "bias", param_labels),
            )
        )
    return optax.chain(*transforms)


def maybe_add_gradient_clipping(cfg, optimizer: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap with gradient clipping per SOLVER.CLIP_GRADIENTS
    (reference solver/build.py:29-117; clipping is whole-model, the natural
    form in a functional optimizer — the reference's per-parameter option is
    the legacy default)."""
    clip_cfg = cfg.SOLVER.CLIP_GRADIENTS
    if not clip_cfg.ENABLED:
        return optimizer
    if clip_cfg.CLIP_TYPE == "value":
        clip = optax.clip(clip_cfg.CLIP_VALUE)
    elif clip_cfg.CLIP_TYPE == "norm":
        clip = optax.clip_by_global_norm(clip_cfg.CLIP_VALUE)
    else:
        raise ValueError(f"Unknown clip type {clip_cfg.CLIP_TYPE}")
    return optax.chain(clip, optimizer)


def build_lr_scheduler(cfg, base_lr: Optional[float] = None) -> LRMultiplier:
    """Build the LR schedule from config (reference solver/build.py:283-322)."""
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if base_lr is None:
        base_lr = cfg.SOLVER.BASE_LR
    max_iter = cfg.SOLVER.MAX_ITER
    if name == "WarmupMultiStepLR":
        steps = [x for x in cfg.SOLVER.STEPS if x <= max_iter]
        return WarmupMultiStepLR(
            base_lr,
            steps,
            max_iter,
            gamma=cfg.SOLVER.GAMMA,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    elif name == "WarmupCosineLR":
        end_fraction = cfg.SOLVER.BASE_LR_END / max(cfg.SOLVER.BASE_LR, 1e-12)
        return WarmupCosineLR(
            base_lr,
            max_iter,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
            end_lr_fraction=end_fraction,
        )
    elif name == "WarmupPolyLR":
        # the DeepLab-project schedule; its keys only exist after
        # add_deeplab_config (reference keeps this in the project's
        # build_solver.py — routed here so plain build_optimizer works too)
        from detectron2_tpu.projects.deeplab.build_solver import WarmupPolyLR

        return WarmupPolyLR(
            base_lr,
            max_iter,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
            power=cfg.SOLVER.POLY_LR_POWER,
            constant_ending=cfg.SOLVER.POLY_LR_CONSTANT_ENDING,
        )
    else:
        raise ValueError(f"Unknown LR scheduler: {name}")


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Build the optimizer from config (reference solver/build.py:119; the
    Panoptic-DeepLab project adds a SOLVER.OPTIMIZER=ADAM selector which its
    build_optimizer dispatches on)."""
    labels = get_param_labels(params)
    schedule = build_lr_scheduler(cfg)
    kind = getattr(cfg.SOLVER, "OPTIMIZER", "SGD").upper()
    if kind == "ADAM":
        opt = adamw_with_param_groups(
            schedule,
            weight_decay=cfg.SOLVER.WEIGHT_DECAY,
            weight_decay_norm=cfg.SOLVER.WEIGHT_DECAY_NORM,
            weight_decay_bias=cfg.SOLVER.WEIGHT_DECAY_BIAS,
            param_labels=labels,
        )
    else:
        opt = sgd_with_param_groups(
            schedule,
            momentum=cfg.SOLVER.MOMENTUM,
            nesterov=cfg.SOLVER.NESTEROV,
            weight_decay=cfg.SOLVER.WEIGHT_DECAY,
            weight_decay_norm=cfg.SOLVER.WEIGHT_DECAY_NORM,
            weight_decay_bias=cfg.SOLVER.WEIGHT_DECAY_BIAS,
            bias_lr_factor=cfg.SOLVER.BIAS_LR_FACTOR,
            param_labels=labels,
        )
    return maybe_add_gradient_clipping(cfg, opt)
