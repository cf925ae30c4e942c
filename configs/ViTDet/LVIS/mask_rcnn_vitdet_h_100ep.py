"""ViTDet ViT-H Mask R-CNN on LVIS v1 (analogue of reference
projects/ViTDet/configs/LVIS/mask_rcnn_vitdet_h_100ep.py)."""

from .mask_rcnn_vitdet_b_100ep import dataloader, lr_multiplier, model, optimizer, train  # noqa

model.backbone.net.embed_dim = 1280
model.backbone.net.depth = 32
model.backbone.net.num_heads = 16
model.backbone.net.drop_path_rate = 0.4  # LVIS recipe uses 0.4 (COCO-H: 0.5)
model.backbone.net.use_checkpoint = True
# 7, 15, 23, 31 for global attention
model.backbone.net.window_block_indexes = tuple(
    i for i in range(32) if i not in (7, 15, 23, 31)
)

optimizer.num_layers = 32
optimizer.lr_decay_rate = 0.9
optimizer.base_lr = 1e-4
lr_multiplier.base_lr = 1e-4

train["output_dir"] = "./output/lvis_vitdet_h_100ep"
