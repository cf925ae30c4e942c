"""RetinaNet with SyncBN in the shared head (analogue of reference
projects/Rethinking-BatchNorm/configs/retinanet_SyncBNhead.py).

The reference's point: a head shared across FPN levels with per-level BN
statistics is wrong; SyncBN over all levels (here: a single norm applied to
each level's activations inside one compiled program, reduced over the data
axis) is the sound variant.
"""

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model

cfg = get_cfg()
cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
cfg.MODEL.RESNETS.DEPTH = 50
cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
cfg.MODEL.RETINANET.NORM = "SyncBN"
cfg.SOLVER.MAX_ITER = 270000
cfg.SOLVER.STEPS = (210000, 250000)

model = cfg  # yacs-style project config: consume with build_model(model)
