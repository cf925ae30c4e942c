"""ViTDet Cascade Mask R-CNN Swin-B (IN21k) on LVIS v1, 50 epochs (analogue of
reference projects/ViTDet/configs/LVIS/cascade_mask_rcnn_swin_b_in21k_50ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.backbone.swin import SwinTransformer

from .cascade_mask_rcnn_mvitv2_b_in21k_100ep import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

model.backbone.bottom_up = L(SwinTransformer)(
    depths=(2, 2, 18, 2),
    drop_path_rate=0.3,  # LVIS swin recipe (COCO: 0.4)
    embed_dim=128,
    num_heads=(4, 8, 16, 32),
)
model.backbone.in_features = ("p0", "p1", "p2", "p3")

# 100ep -> 50ep
train["max_iter"] = train["max_iter"] // 2
lr_multiplier.multiplier.scheduler.milestones = [138889 // 2, 150463 // 2]
lr_multiplier.multiplier.scheduler.num_updates = train["max_iter"]
lr_multiplier.multiplier.warmup_length = 250 / train["max_iter"]
lr_multiplier.max_iter = train["max_iter"]
lr_multiplier.base_lr = 1e-4
optimizer.lr_schedule = 1e-4

train["output_dir"] = "./output/lvis_cascade_swin_b_in21k_50ep"
