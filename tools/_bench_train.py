import time
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.parallel import TrainState, make_train_step
from detectron2_tpu.solver import build_optimizer

# production zoo config: the raw get_cfg() defaults are the C4 conventions
# (14x14 box pooler, 12000 pre-NMS/level) and overstate pooler/NMS cost ~4x
from detectron2_tpu import model_zoo
cfg = model_zoo.get_config("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
cfg.SOLVER.MAX_ITER = 1000
model = build_model(cfg)

B,H,W,G = 8, 800, 1344, 50
rng = np.random.RandomState(0)
xy = rng.rand(B, G, 2) * 600
wh = rng.rand(B, G, 2) * 300 + 16
batch = {
  "image": jnp.asarray(rng.randint(0,255,(B,H,W,3)).astype(np.uint8)),
  "image_sizes": jnp.tile(jnp.asarray([[H,W]],jnp.int32),(B,1)),
  "gt_boxes": jnp.asarray(np.concatenate([xy, xy+wh], -1).astype(np.float32)),
  "gt_classes": jnp.asarray(rng.randint(0,80,(B,G)).astype(np.int32)),
  "gt_valid": jnp.ones((B,G), bool),
  "gt_masks": jnp.asarray((rng.rand(B,G,28,28)>0.5).astype(np.float32)),
}
params = model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                    jax.tree_util.tree_map(lambda x: x[:1], batch), train=True)
tx = build_optimizer(cfg, params)
state = TrainState.create(params, tx)
step = make_train_step(model)
k = jax.random.PRNGKey(3)
flops_per_step = 0.0
try:
    compiled = step.lower(state, batch, k).compile()
    flops_per_step = float((compiled.cost_analysis() or {}).get("flops", 0.0))
except Exception:
    pass
state, losses = step(state, batch, k)
print("compile done; loss", float(np.asarray(losses["total_loss"])))
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, losses = step(state, batch, jax.random.fold_in(k, i))
tl = float(np.asarray(losses["total_loss"]))
dt = (time.perf_counter()-t0)/N
msg = f"train step: {dt*1000:.1f} ms/iter batch {B} -> {B/dt:.2f} img/s (loss {tl:.2f})"
if flops_per_step > 0:
    from detectron2_tpu.utils.analysis import mfu
    msg += f" | {flops_per_step/B/1e12:.3f} TFLOP/im"
    u = mfu(flops_per_step, dt, dtype=cfg.TPU.COMPUTE_DTYPE)
    if u is not None:
        msg += f" | MFU {u*100:.1f}%"
print(msg)
