"""ViTDet Cascade Mask R-CNN Swin-B (IN21k), 50-epoch LSJ recipe (analogue of
reference projects/ViTDet/configs/COCO/cascade_mask_rcnn_swin_b_in21k_50ep.py):
the MViTv2 cascade recipe with the backbone swapped for Swin-B."""

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
    drop_path_rate=0.4,
    embed_dim=128,
    num_heads=(4, 8, 16, 32),
)
model.backbone.in_features = ("p0", "p1", "p2", "p3")

# 100ep -> 50ep
train["max_iter"] = train["max_iter"] // 2
lr_multiplier.multiplier.scheduler.milestones = [163889 // 2, 177546 // 2]
lr_multiplier.multiplier.scheduler.num_updates = train["max_iter"]
lr_multiplier.max_iter = train["max_iter"]

# optimized swin hyperparams (reference: lr 4e-5, wd 0.05)
optimizer.lr_schedule = 4e-5
optimizer.weight_decay = 0.05
lr_multiplier.base_lr = 4e-5

train["output_dir"] = "./output/cascade_swin_b_in21k_50ep"
