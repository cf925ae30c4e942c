import time
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model

cfg = get_cfg()
cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
cfg.MODEL.RESNETS.OUT_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.FPN.IN_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32],[64],[128],[256],[512]]
cfg.MODEL.RPN.IN_FEATURES = ["p2","p3","p4","p5","p6"]
cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2","p3","p4","p5"]
cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
cfg.MODEL.MASK_ON = True
model = build_model(cfg)

B,H,W = 8, 800, 1344
rng = np.random.RandomState(0)
batch = {"image": jnp.asarray(rng.randint(0,255,(B,H,W,3)).astype(np.uint8)),
         "image_sizes": jnp.tile(jnp.asarray([[H,W]],jnp.int32),(B,1))}
params = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                    {"image": batch["image"][:1], "image_sizes": batch["image_sizes"][:1]}, train=False)
fwd = jax.jit(lambda p,b: model.apply(p,b,train=False))
out = fwd(params, batch)
print("warm checksum", float(np.asarray(out["scores"]).sum()))
with jax.profiler.trace("/tmp/jaxtrace_full"):
    for _ in range(2):
        out = fwd(params, batch)
    float(np.asarray(out["scores"]).sum())
print("done")
