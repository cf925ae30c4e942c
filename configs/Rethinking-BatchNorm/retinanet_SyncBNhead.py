"""RetinaNet with SyncBN in the shared head (analogue of reference
projects/Rethinking-BatchNorm/configs/retinanet_SyncBNhead.py).

The reference's point: a head shared across FPN levels with per-level BN
statistics is wrong; SyncBN over all levels (here: a single norm applied to
each level's activations inside one compiled program, reduced over the data
axis) is the sound variant.
"""

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.config import get_cfg


def _build_retinanet_syncbn():
    from detectron2_tpu.modeling.meta_arch.retinanet import RetinaNet

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NORM = "SyncBN"
    # Base-RetinaNet.yaml anchors: 3 octave scales per level x 3 aspects
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [x, x * 2 ** (1.0 / 3), x * 2 ** (2.0 / 3)] for x in [32, 64, 128, 256, 512]
    ]
    return RetinaNet.from_config(cfg)


model = L(_build_retinanet_syncbn)()

train = dict(
    output_dir="./output/retinanet_SyncBNhead",
    init_checkpoint="detectron2://ImageNetPretrained/MSRA/R-50.pkl",
    max_iter=270000,
    checkpointer=dict(period=5000),
    eval_period=10000,
    log_period=20,
)
