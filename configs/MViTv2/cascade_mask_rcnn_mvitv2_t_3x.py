"""Cascade Mask R-CNN MViTv2-T 3x (analogue of reference
projects/MViTv2/configs/cascade_mask_rcnn_mvitv2_t_3x.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.roi_heads import (
    CascadeROIHeads,
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
)

from .mask_rcnn_mvitv2_t_3x import dataloader, lr_multiplier, model, optimizer, train  # noqa

# sync-BN mask head + 2-conv RPN (the reference's TPU-Mask-R-CNN-style heads)
model.roi_heads.mask_head.conv_norm = "SyncBN"
model.proposal_generator.head.conv_dims = (-1, -1)

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
        # reference: NaiveSyncBatchNorm(stats_mode="N") (empty-input-safe); our
        # padded heads never see empty batches, so cross-replica SyncBN matches
        L(FastRCNNConvFCHead)(conv_dims=(256, 256, 256, 256), fc_dims=(1024,), conv_norm="SyncBN")
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

train["output_dir"] = "./output/cascade_mvitv2_t_3x"
