"""ViTDet: Mask R-CNN with a plain ViT-B backbone + SimpleFeaturePyramid
(analogue of reference configs/common/models/mask_rcnn_vitdet.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.backbone.vit import SimpleFeaturePyramid, ViT

from .mask_rcnn_fpn import model  # noqa: relative config import

model.backbone = L(SimpleFeaturePyramid)(
    net=L(ViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        mlp_ratio=4.0,
        qkv_bias=True,
        use_abs_pos=True,
        use_rel_pos=True,
        drop_path_rate=0.1,
        window_size=14,
        # global attention every 3rd block (ViTDet-B recipe)
        window_block_indexes=(0, 1, 3, 4, 6, 7, 9, 10),
        out_feature="last_feat",
    ),
    in_feature="last_feat",
    out_channels=256,
    scale_factors=(4.0, 2.0, 1.0, 0.5),
    top_block_levels=1,
    norm="LN",
)

# LN box/mask heads, 2-conv RPN head, 4conv1fc box head
# (reference mask_rcnn_vitdet.py:52-59)
model.roi_heads.box_head.conv_norm = "LN"
model.roi_heads.mask_head.conv_norm = "LN"
model.proposal_generator.head.conv_dims = (-1, -1)
model.roi_heads.box_head.conv_dims = (256, 256, 256, 256)
model.roi_heads.box_head.fc_dims = (1024,)

# ViTDet uses ImageNet RGB stats and LSJ-style square inputs
model.pixel_mean = (123.675, 116.28, 103.53)
model.pixel_std = (58.395, 57.12, 57.375)
model.input_format = "RGB"
