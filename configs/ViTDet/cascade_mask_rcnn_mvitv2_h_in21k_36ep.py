"""ViTDet Cascade Mask R-CNN MViTv2-H (IN21k), 36-epoch LSJ recipe (analogue
of reference projects/ViTDet/configs/COCO/cascade_mask_rcnn_mvitv2_h_in21k_36ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from .cascade_mask_rcnn_mvitv2_b_in21k_100ep import (  # noqa
    dataloader,
    model,
    optimizer,
    train,
)

# MViTv2-H: depth 80, last_block_indexes (3, 11, 71, 79)
model.backbone.bottom_up.embed_dim = 192
model.backbone.bottom_up.depths = (4, 8, 60, 8)
model.backbone.bottom_up.num_heads = (3, 6, 12, 24)
model.backbone.bottom_up.drop_path_rate = 0.6
model.backbone.bottom_up.use_checkpoint = True  # remat the 80 blocks

# 36 epochs
train["max_iter"] = 67500
lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[52500, 62500],
            num_updates=train["max_iter"],
        ),
        warmup_factor=0.001,
        warmup_length=250 / train["max_iter"],
    ),
    max_iter=train["max_iter"],
    base_lr=1.6e-4,
)

optimizer.lr_schedule = 1.6e-4

train["output_dir"] = "./output/cascade_mvitv2_h_in21k_36ep"
