"""ViTDet ViT-H Mask R-CNN, 75-epoch LSJ recipe (analogue of reference
projects/ViTDet/configs/COCO/mask_rcnn_vitdet_h_75ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from .mask_rcnn_vitdet_b_100ep import dataloader, model, optimizer, train  # noqa

model.backbone.net.embed_dim = 1280
model.backbone.net.depth = 32
model.backbone.net.num_heads = 16
model.backbone.net.drop_path_rate = 0.5
model.backbone.net.use_checkpoint = True  # remat: ViT-H activations at 1024^2
# 7, 15, 23, 31 for global attention
model.backbone.net.window_block_indexes = tuple(
    i for i in range(32) if i not in (7, 15, 23, 31)
)

optimizer.num_layers = 32
optimizer.lr_decay_rate = 0.9

# 100ep -> 75ep
train["max_iter"] = train["max_iter"] * 3 // 4
lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[163889 * 3 // 4, 177546 * 3 // 4],
            num_updates=train["max_iter"],
        ),
        warmup_factor=0.001,
        warmup_length=250 / train["max_iter"],
    ),
    max_iter=train["max_iter"],
    base_lr=1e-4,
)

train["output_dir"] = "./output/vitdet_h_75ep"
