"""Cascade Mask R-CNN MViTv2-L (IN21k) LSJ 50ep (analogue of reference
projects/MViTv2/configs/cascade_mask_rcnn_mvitv2_l_in21k_lsj_50ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from .cascade_mask_rcnn_mvitv2_b_3x import model, optimizer, train  # noqa
from .common.coco_loader_lsj import dataloader  # noqa

model.backbone.bottom_up.embed_dim = 144
model.backbone.bottom_up.depths = (2, 6, 36, 4)  # depth 48, lbi (1, 7, 43, 47)
model.backbone.bottom_up.num_heads = (2, 4, 8, 16)
model.backbone.bottom_up.drop_path_rate = 0.5

# 50ep = 184375 // 2 iters * 64 images/iter / 118000 images/ep
train["max_iter"] = 184375 // 2
train["init_checkpoint"] = ""  # IN21k MViTv2-L via the .pyth converter
lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[163889 // 2, 177546 // 2],
            num_updates=train["max_iter"],
        ),
        warmup_factor=0.001,
        warmup_length=250 / train["max_iter"],
    ),
    max_iter=train["max_iter"],
    base_lr=1e-4,
)
optimizer.base_lr = 1e-4

train["output_dir"] = "./output/cascade_mvitv2_l_in21k_lsj_50ep"
