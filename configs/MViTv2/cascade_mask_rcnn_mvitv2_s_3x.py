"""Cascade Mask R-CNN MViTv2-S 3x (analogue of reference
projects/MViTv2/configs/cascade_mask_rcnn_mvitv2_s_3x.py)."""

from .cascade_mask_rcnn_mvitv2_t_3x import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

# MViTv2-S: depth 16, last_block_indexes (0, 2, 13, 15)
model.backbone.bottom_up.depths = (1, 2, 11, 2)

train["init_checkpoint"] = ""  # IN1k MViTv2-S via the .pyth converter
train["output_dir"] = "./output/cascade_mvitv2_s_3x"
