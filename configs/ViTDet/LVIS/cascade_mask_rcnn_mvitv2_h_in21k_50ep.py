"""ViTDet Cascade Mask R-CNN MViTv2-H (IN21k) on LVIS v1, 50 epochs (analogue
of reference projects/ViTDet/configs/LVIS/cascade_mask_rcnn_mvitv2_h_in21k_50ep.py)."""

from .cascade_mask_rcnn_mvitv2_b_in21k_100ep import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

model.backbone.bottom_up.embed_dim = 192
model.backbone.bottom_up.depths = (4, 8, 60, 8)
model.backbone.bottom_up.num_heads = (3, 6, 12, 24)
model.backbone.bottom_up.drop_path_rate = 0.6
model.backbone.bottom_up.use_checkpoint = True

# 100ep -> 50ep
train["max_iter"] = train["max_iter"] // 2
lr_multiplier.multiplier.scheduler.milestones = [138889 // 2, 150463 // 2]
lr_multiplier.multiplier.scheduler.num_updates = train["max_iter"]
lr_multiplier.multiplier.warmup_length = 250 / train["max_iter"]
lr_multiplier.max_iter = train["max_iter"]
lr_multiplier.base_lr = 2e-5
optimizer.lr_schedule = 2e-5

train["output_dir"] = "./output/lvis_cascade_mvitv2_h_in21k_50ep"
