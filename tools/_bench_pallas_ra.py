import time
import numpy as np, jax, jax.numpy as jnp
from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_multilevel

rng = np.random.RandomState(0)
C = 256
feats = {"0": jnp.asarray(rng.rand(8, 200, 336, C), jnp.bfloat16),
         "1": jnp.asarray(rng.rand(8, 100, 168, C), jnp.bfloat16),
         "2": jnp.asarray(rng.rand(8, 50, 84, C), jnp.bfloat16),
         "3": jnp.asarray(rng.rand(8, 25, 42, C), jnp.bfloat16)}
R = 8000
xy = rng.rand(R, 2) * 800
wh = rng.rand(R, 2) * 200 + 8
boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
bidx = jnp.asarray(rng.randint(0, 8, R), jnp.int32)
lvl = jnp.asarray(rng.randint(0, 4, R), jnp.int32)

f = jax.jit(lambda ft, b, bi, lv: roi_align_pallas_multilevel(
    ft, b, bi, lv, ("0","1","2","3"), (0.25,0.125,0.0625,0.03125), (7,7), sampling_ratio=2, x_window=32, y_window=16))
out = f(feats, boxes, bidx, lvl)
print("checksum", float(np.asarray(out, np.float32).sum()))
t0 = time.perf_counter()
for _ in range(10):
    out = f(feats, boxes, bidx, lvl)
s = float(np.asarray(out, np.float32).sum())
dt = (time.perf_counter()-t0)/10
print(f"pallas roi_align: {dt*1000:.2f} ms for {R} rois 7x7x{C} (checksum {s:.1f})")

# correctness spot-check vs XLA on small subset
from detectron2_tpu.ops.roi_align import roi_align_multilevel
small = jax.jit(lambda ft, b, bi, lv: roi_align_multilevel(
    ft, b, bi, lv, ("0","1","2","3"), (0.25,0.125,0.0625,0.03125), (7,7), sampling_ratio=2))
ref = np.asarray(small(feats, boxes[:64], bidx[:64], lvl[:64]), np.float32)
got = np.asarray(f(feats, boxes, bidx, lvl)[:64], np.float32)
print("max abs diff vs xla:", np.abs(ref-got).max())
