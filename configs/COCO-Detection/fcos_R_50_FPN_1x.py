"""FCOS R50-FPN 1x (lazy config; analogue of reference
configs/COCO-Detection/fcos_R_50_FPN_1x.py)."""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling.meta_arch.fcos import FCOS, FCOSHead


def _build_fcos():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CONVS = 4
    return FCOS.from_config(cfg)


model = L(_build_fcos)()

train = dict(
    output_dir="./output/fcos",
    init_checkpoint="detectron2://ImageNetPretrained/MSRA/R-50.pkl",
    max_iter=90000,
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)
