"""Cascade Mask R-CNN MViTv2-H (IN21k) LSJ 3x (analogue of reference
projects/MViTv2/configs/cascade_mask_rcnn_mvitv2_h_in21k_lsj_3x.py)."""

from .cascade_mask_rcnn_mvitv2_b_3x import lr_multiplier, model, optimizer, train  # noqa
from .common.coco_loader_lsj import dataloader  # noqa

model.backbone.bottom_up.embed_dim = 192
model.backbone.bottom_up.depths = (4, 8, 60, 8)  # depth 80, lbi (3, 11, 71, 79)
model.backbone.bottom_up.num_heads = (3, 6, 12, 24)
model.backbone.bottom_up.drop_path_rate = 0.6
model.backbone.bottom_up.use_checkpoint = True  # remat the 80 blocks

train["init_checkpoint"] = ""  # IN21k MViTv2-H via the .pyth converter
train["output_dir"] = "./output/cascade_mvitv2_h_in21k_lsj_3x"
