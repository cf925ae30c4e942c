"""ViTDet Cascade Mask R-CNN Swin-L (IN21k) on LVIS v1, 50 epochs (analogue of
reference projects/ViTDet/configs/LVIS/cascade_mask_rcnn_swin_l_in21k_50ep.py)."""

from .cascade_mask_rcnn_swin_b_in21k_50ep import (  # noqa
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

model.backbone.bottom_up.embed_dim = 192
model.backbone.bottom_up.num_heads = (6, 12, 24, 48)

train["output_dir"] = "./output/lvis_cascade_swin_l_in21k_50ep"
