"""Cross-check pallas vs XLA RoIAlign inside the full model on TPU."""
import os
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model

cfg = get_cfg()
cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
cfg.MODEL.RESNETS.OUT_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.FPN.IN_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32],[64],[128],[256],[512]]
cfg.MODEL.RPN.IN_FEATURES = ["p2","p3","p4","p5","p6"]
cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2","p3","p4","p5"]
cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
cfg.MODEL.MASK_ON = True
cfg.TEST.DETECTIONS_PER_IMAGE = 20
model = build_model(cfg)

B,H,W = 2, 256, 320
rng = np.random.RandomState(0)
batch = {"image": jnp.asarray(rng.randint(0,255,(B,H,W,3)).astype(np.float32)),
         "image_sizes": jnp.tile(jnp.asarray([[H,W]],jnp.int32),(B,1))}
params = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=False)

import detectron2_tpu.ops.roi_align as ra_mod
import importlib
ra = importlib.import_module('detectron2_tpu.ops.roi_align')

out_p = jax.jit(lambda p,b: model.apply(p,b,train=False))(params, batch)
boxes_p = np.asarray(out_p["pred_boxes"]); scores_p = np.asarray(out_p["scores"])

os.environ["D2T_DISABLE_PALLAS"] = "1"
out_x = jax.jit(lambda p,b: model.apply(p,b,train=False))(params, batch)
boxes_x = np.asarray(out_x["pred_boxes"]); scores_x = np.asarray(out_x["scores"])

print("scores max abs diff:", np.abs(scores_p - scores_x).max())
print("boxes  max abs diff:", np.abs(boxes_p - boxes_x).max())
print("classes equal frac:", (np.asarray(out_p["pred_classes"]) == np.asarray(out_x["pred_classes"])).mean())
print("valid equal:", (np.asarray(out_p["valid"]) == np.asarray(out_x["valid"])).all())
