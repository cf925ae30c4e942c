"""Cascade Mask R-CNN MViTv2-B (IN21k init) 3x (analogue of reference
projects/MViTv2/configs/cascade_mask_rcnn_mvitv2_b_in21k_3x.py)."""

from .cascade_mask_rcnn_mvitv2_b_3x import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

train["init_checkpoint"] = ""  # IN21k MViTv2-B via the .pyth converter
train["output_dir"] = "./output/cascade_mvitv2_b_in21k_3x"
