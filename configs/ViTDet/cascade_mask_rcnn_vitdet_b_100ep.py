"""ViTDet ViT-B Cascade Mask R-CNN, 100-epoch LSJ recipe (analogue of
reference projects/ViTDet/configs/COCO/cascade_mask_rcnn_vitdet_b_100ep.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.roi_heads import (
    CascadeROIHeads,
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
)

from .mask_rcnn_vitdet_b_100ep import dataloader, lr_multiplier, model, optimizer, train  # noqa

# cascade heads: 3 stages, class-agnostic regression, increasing IoU
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

train["output_dir"] = "./output/cascade_vitdet_b_100ep"
