"""Mask R-CNN MViTv2-T 3x
(analogue of reference projects/MViTv2/configs/mask_rcnn_mvitv2_t_3x.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.backbone import FPN, LastLevelMaxPool
from detectron2_tpu.modeling.backbone.mvit import MViT
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from ..common.models.mask_rcnn_fpn import model  # noqa
from .common.coco_loader import dataloader  # noqa

# MViTv2-T: depths (1, 2, 5, 2)
model.backbone = L(FPN)(
    bottom_up=L(MViT)(
        embed_dim=96,
        depths=(1, 2, 5, 2),
        num_heads=(1, 2, 4, 8),
        drop_path_rate=0.2,
        out_features=("scale2", "scale3", "scale4", "scale5"),
    ),
    in_features=("scale2", "scale3", "scale4", "scale5"),
    out_channels=256,
    top_block=L(LastLevelMaxPool)(),
)
model.pixel_mean = (123.675, 116.28, 103.53)
model.pixel_std = (58.395, 57.12, 57.375)
model.input_format = "RGB"

train = dict(
    output_dir="./output/mvitv2_t_3x",
    init_checkpoint="",
    max_iter=270000,
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)

lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[210000, 250000],
            num_updates=270000,
        ),
        warmup_factor=0.001,
        warmup_length=250 / 270000,
    ),
    max_iter=270000,
    base_lr=1.6e-4,
)


def make_optimizer(params, base_lr=1.6e-4, weight_decay=0.1):
    """AdamW (the MViTv2 detection recipe)."""
    import optax

    return optax.adamw(base_lr, weight_decay=weight_decay)


optimizer = make_optimizer
