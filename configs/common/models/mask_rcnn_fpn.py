"""Composable Mask R-CNN R50-FPN model config
(analogue of reference configs/common/models/mask_rcnn_fpn.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.modeling import GeneralizedRCNN, StandardROIHeads
from detectron2_tpu.modeling.anchor_generator import DefaultAnchorGenerator
from detectron2_tpu.modeling.backbone import FPN, LastLevelMaxPool
from detectron2_tpu.modeling.backbone.resnet import ResNet
from detectron2_tpu.modeling.proposal_generator import RPN, StandardRPNHead
from detectron2_tpu.modeling.roi_heads import (
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
    MaskRCNNConvUpsampleHead,
)


def _resnet50_specs():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling.backbone.resnet import make_stage_specs

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    specs = make_stage_specs(cfg)
    return tuple(tuple(dict(b) for b in blocks) for blocks in specs)


model = L(GeneralizedRCNN)(
    backbone=L(FPN)(
        bottom_up=L(ResNet)(
            stage_specs=_resnet50_specs(),
            norm="FrozenBN",
            out_features=("res2", "res3", "res4", "res5"),
            freeze_at=2,
        ),
        in_features=("res2", "res3", "res4", "res5"),
        out_channels=256,
        top_block=L(LastLevelMaxPool)(),
    ),
    proposal_generator=L(RPN)(
        in_features=("p2", "p3", "p4", "p5", "p6"),
        head=L(StandardRPNHead)(num_anchors=3, in_channels=256),
        anchor_generator=L(DefaultAnchorGenerator)(
            sizes=[[32], [64], [128], [256], [512]],
            aspect_ratios=[0.5, 1.0, 2.0],
            strides=[4, 8, 16, 32, 64],
            offset=0.0,
        ),
        anchor_matcher_cfg=((0.3, 0.7), (0, -1, 1), True),
        box2box_weights=(1.0, 1.0, 1.0, 1.0),
        batch_size_per_image=256,
        positive_fraction=0.5,
        pre_nms_topk_train=2000,
        pre_nms_topk_test=1000,
        post_nms_topk_train=1000,
        post_nms_topk_test=1000,
        nms_thresh=0.7,
    ),
    roi_heads=L(StandardROIHeads)(
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
        box_head=L(FastRCNNConvFCHead)(conv_dims=(), fc_dims=(1024, 1024)),
        box_predictor=L(FastRCNNOutputLayers)(
            num_classes=80,
            box2box_weights=(10.0, 10.0, 5.0, 5.0),
            test_score_thresh=0.05,
        ),
        mask_pooler_resolution=14,
        mask_head=L(MaskRCNNConvUpsampleHead)(
            num_classes=80,
            # reference convention: conv_dims[:-1] are the 4 convs,
            # conv_dims[-1] the deconv (reference mask_rcnn_fpn.py:89)
            conv_dims=(256, 256, 256, 256, 256),
        ),
    ),
    pixel_mean=(103.530, 116.280, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
    input_format="BGR",
)
