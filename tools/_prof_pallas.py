import time
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_multilevel

rng = np.random.RandomState(0)
C = 256
feats = {"0": jnp.asarray(rng.rand(8, 200, 336, C), jnp.bfloat16),
         "1": jnp.asarray(rng.rand(8, 100, 168, C), jnp.bfloat16)}
R = 1024
xy = rng.rand(R, 2) * 700
wh = rng.rand(R, 2) * 100 + 8
boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
bidx = jnp.asarray(rng.randint(0, 8, R), jnp.int32)
lvl = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
f = jax.jit(lambda ft, b, bi, lv: roi_align_pallas_multilevel(
    ft, b, bi, lv, ("0","1"), (0.25,0.125), (7,7), sampling_ratio=2))
out = f(feats, boxes, bidx, lvl)
float(np.asarray(out, np.float32).sum())
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        out = f(feats, boxes, bidx, lvl)
    float(np.asarray(out, np.float32).sum())
t0=time.perf_counter()
for _ in range(10):
    out = f(feats, boxes, bidx, lvl)
float(np.asarray(out, np.float32).sum())
print(f"{(time.perf_counter()-t0)/10*1000:.2f} ms for {R} rois")
