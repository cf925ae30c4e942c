import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
import detectron2_tpu.ops.pallas.roi_align_pallas as rap
from detectron2_tpu.ops.roi_align import roi_align_multilevel

_orig = pl.pallas_call
pl.pallas_call = functools.partial(_orig, interpret=True)

rng = np.random.RandomState(0)
C = 128
feats = {"0": jnp.asarray(rng.rand(2, 32, 48, C).astype(np.float32)),
         "1": jnp.asarray(rng.rand(2, 16, 24, C).astype(np.float32))}
R = 8
xy = rng.rand(R, 2) * 100
wh = rng.rand(R, 2) * 60 + 8
boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
bidx = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
lvl = jnp.asarray(rng.randint(0, 2, R), jnp.int32)
args = (feats, boxes, bidx, lvl, ("0", "1"), (0.25, 0.125), (7, 7))
ref = np.asarray(roi_align_multilevel(*args, sampling_ratio=2))
out = np.asarray(rap.roi_align_pallas_multilevel(*args, sampling_ratio=2))
diff = np.abs(out - ref)
print("max diff", diff.max(), "mean", diff.mean())
per_roi = diff.reshape(R, -1).max(1)
print("per-roi max:", np.round(per_roi, 4))
print("boxes:", np.round(np.asarray(boxes), 1))
print("lvl:", np.asarray(lvl), "bidx:", np.asarray(bidx))
i = int(per_roi.argmax())
print("worst roi", i)
print("ref[...,0]:\n", np.round(ref[i,:,:,0],3))
print("out[...,0]:\n", np.round(out[i,:,:,0],3))
