"""ViTDet ViT-L Mask R-CNN, 100-epoch LSJ recipe (analogue of reference
projects/ViTDet/configs/COCO/mask_rcnn_vitdet_l_100ep.py)."""

from .mask_rcnn_vitdet_b_100ep import dataloader, lr_multiplier, model, optimizer, train  # noqa

model.backbone.net.embed_dim = 1024
model.backbone.net.depth = 24
model.backbone.net.num_heads = 16
model.backbone.net.drop_path_rate = 0.4
# 5, 11, 17, 23 for global attention
model.backbone.net.window_block_indexes = tuple(
    i for i in range(24) if i not in (5, 11, 17, 23)
)

optimizer.num_layers = 24
optimizer.lr_decay_rate = 0.8

train["output_dir"] = "./output/vitdet_l_100ep"
