"""ViTDet Cascade Mask R-CNN with an MViTv2-B (IN21k) backbone, 100-epoch LSJ
recipe (analogue of reference
projects/ViTDet/configs/COCO/cascade_mask_rcnn_mvitv2_b_in21k_100ep.py):
FPN over the hierarchical backbone with LN everywhere, 2-conv RPN head,
3-stage cascade with class-agnostic regression."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.data import transforms as T
from detectron2_tpu.modeling.backbone import FPN, LastLevelMaxPool
from detectron2_tpu.modeling.backbone.mvit import MViT
from detectron2_tpu.modeling.roi_heads import (
    CascadeROIHeads,
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
    MaskRCNNConvUpsampleHead,
)
from detectron2_tpu.solver.lr_scheduler import (
    LRMultiplier,
    MultiStepParamScheduler,
    WarmupParamScheduler,
)

from ..common.data.coco import dataloader
from ..common.models.mask_rcnn_fpn import model  # noqa
from ..common.optim import AdamW as optimizer

model.backbone = L(FPN)(
    bottom_up=L(MViT)(
        embed_dim=96,
        depths=(2, 3, 16, 3),
        num_heads=(1, 2, 4, 8),
        drop_path_rate=0.4,
        residual_pooling=True,
        out_features=("scale2", "scale3", "scale4", "scale5"),
    ),
    in_features=("scale2", "scale3", "scale4", "scale5"),
    out_channels=256,
    norm="LN",
    top_block=L(LastLevelMaxPool)(),
)
model.pixel_mean = (123.675, 116.28, 103.53)
model.pixel_std = (58.395, 57.12, 57.375)
model.input_format = "RGB"

# 2-conv RPN head; LN box/mask heads
model.proposal_generator.head.conv_dims = (-1, -1)
model.roi_heads.mask_head = L(MaskRCNNConvUpsampleHead)(
    num_classes=80, conv_dims=(256, 256, 256, 256, 256), conv_norm="LN"
)

model.roi_heads = L(CascadeROIHeads)(
    num_classes=80,
    batch_size_per_image=512,
    positive_fraction=0.25,
    matcher_thresholds=(0.5,),
    matcher_labels=(0, 1),
    in_features=("p2", "p3", "p4", "p5"),
    pooler_scales=(1.0 / 4, 1.0 / 8, 1.0 / 16, 1.0 / 32),
    box_pooler_resolution=7,
    pooler_sampling_ratio=0,
    pooler_type="ROIAlignV2",
    box_head=[
        L(FastRCNNConvFCHead)(conv_dims=(256, 256, 256, 256), fc_dims=(1024,), conv_norm="LN")
        for _ in range(3)
    ],
    box_predictor=[
        L(FastRCNNOutputLayers)(
            num_classes=80,
            box2box_weights=w,
            cls_agnostic_bbox_reg=True,
            test_score_thresh=0.05,
        )
        for w in [(10, 10, 5, 5), (20, 20, 10, 10), (30, 30, 15, 15)]
    ],
    cascade_ious=(0.5, 0.6, 0.7),
    cascade_bbox_reg_weights=((10, 10, 5, 5), (20, 20, 10, 10), (30, 30, 15, 15)),
    mask_pooler_resolution=14,
    mask_head=model.roi_heads.mask_head,
)

# LSJ onto a fixed 1024 square
image_size = 1024
dataloader.train.mapper.augmentations = [
    L(T.RandomFlip)(horizontal=True),
    L(T.ResizeScale)(
        min_scale=0.1, max_scale=2.0, target_height=image_size, target_width=image_size
    ),
    L(T.FixedSizeCrop)(crop_size=(image_size, image_size)),
]
dataloader.train.mapper.use_instance_mask = True
dataloader.train.mapper.recompute_boxes = True
dataloader.train.mapper.image_format = "RGB"
dataloader.train.total_batch_size = 64
dataloader.test.mapper.augmentations = [
    L(T.ResizeShortestEdge)(short_edge_length=image_size, max_size=image_size)
]
dataloader.test.mapper.image_format = "RGB"

train = dict(
    output_dir="./output/cascade_mvitv2_b_in21k_100ep",
    init_checkpoint="",  # IN21k MViTv2-B via the .pyth converter
    max_iter=184375,  # 100 ep on COCO with batch 64
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)

lr_multiplier = L(LRMultiplier)(
    multiplier=L(WarmupParamScheduler)(
        scheduler=L(MultiStepParamScheduler)(
            values=[1.0, 0.1, 0.01],
            milestones=[163889, 177546],
            num_updates=train["max_iter"],
        ),
        warmup_factor=0.001,
        warmup_length=250 / train["max_iter"],
    ),
    max_iter=train["max_iter"],
    base_lr=8e-5,
)

optimizer.lr_schedule = 8e-5
