"""FCOS R50-FPN 1x (lazy config; analogue of reference
configs/COCO-Detection/fcos_R_50_FPN_1x.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling.meta_arch.fcos import FCOS, FCOSHead


def _build_fcos():
    from detectron2_tpu.modeling.backbone import FPN
    from detectron2_tpu.modeling.backbone.fpn import LastLevelP6P7
    from detectron2_tpu.modeling.backbone.resnet import build_resnet_backbone

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CONVS = 4
    base = FCOS.from_config(cfg)
    # FCOS computes P6/P7 from P5 (256ch), not C5 — Sec 2.2 of
    # arXiv:2006.09214 (reference common/models/fcos.py:14-16)
    backbone = FPN(
        bottom_up=build_resnet_backbone(cfg),
        in_features=("res3", "res4", "res5"),
        out_channels=256,
        top_block=LastLevelP6P7(out_channels=256, in_feature="p5"),
    )
    return base.clone(backbone=backbone)


model = L(_build_fcos)()

train = dict(
    output_dir="./output/fcos",
    init_checkpoint="detectron2://ImageNetPretrained/MSRA/R-50.pkl",
    max_iter=90000,
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)
