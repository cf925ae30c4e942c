import time, numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model

cfg = get_cfg()
cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
cfg.MODEL.RESNETS.OUT_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.FPN.IN_FEATURES = ["res2","res3","res4","res5"]
cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32],[64],[128],[256],[512]]
cfg.MODEL.RPN.IN_FEATURES = ["p2","p3","p4","p5","p6"]
cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
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

def timed(name, fn, sync_fn, iters=5):
    out = fn()
    sync_fn(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync_fn(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms/batch ({B/dt:.1f} img/s)")

# 1. backbone only
bk = jax.jit(lambda p,b: model.apply(p, b, train=False, method=lambda m,bb,train: m.backbone(m.preprocess_image(bb["image"]), train=train)))
timed("backbone+fpn", lambda: bk(params, batch), lambda o: float(np.asarray(o["p6"]).sum()))

# 2. backbone + rpn
def _rpn(m, bb, train):
    feats = m.backbone(m.preprocess_image(bb["image"]), train=train)
    return m.proposal_generator(feats, bb["image_sizes"], train=train)
rp = jax.jit(lambda p,b: model.apply(p, b, train=False, method=_rpn))
timed("backbone+rpn(nms)", lambda: rp(params, batch), lambda o: float(np.asarray(o[0][1]).sum()))

# 3. full
full = jax.jit(lambda p,b: model.apply(p, b, train=False))
timed("full maskrcnn", lambda: full(params, batch), lambda o: float(np.asarray(o["scores"]).sum()))
