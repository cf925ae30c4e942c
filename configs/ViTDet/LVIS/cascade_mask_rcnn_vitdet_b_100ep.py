"""ViTDet ViT-B Cascade Mask R-CNN on LVIS v1 (analogue of reference
projects/ViTDet/configs/LVIS/cascade_mask_rcnn_vitdet_b_100ep.py): the LVIS
mask recipe with 3-stage cascade heads, federated loss in every stage."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling.roi_heads import (
    CascadeROIHeads,
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
)

from .mask_rcnn_vitdet_b_100ep import (  # noqa
    _fed_loss_weights,
    dataloader,
    lr_multiplier,
    model,
    optimizer,
    train,
)

model.roi_heads = L(CascadeROIHeads)(
    num_classes=1203,
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
            num_classes=1203,
            box2box_weights=w,
            cls_agnostic_bbox_reg=True,
            test_score_thresh=0.02,
            test_topk_per_image=300,
            use_sigmoid_ce=True,
            use_fed_loss=True,
            fed_loss_cls_weights=L(_fed_loss_weights)(),
        )
        for w in [(10, 10, 5, 5), (20, 20, 10, 10), (30, 30, 15, 15)]
    ],
    cascade_ious=(0.5, 0.6, 0.7),
    cascade_bbox_reg_weights=((10, 10, 5, 5), (20, 20, 10, 10), (30, 30, 15, 15)),
    mask_pooler_resolution=14,
    mask_head=model.roi_heads.mask_head,
)

train["output_dir"] = "./output/lvis_cascade_vitdet_b_100ep"
