import time

import numpy as np

import jax
import jax.numpy as jnp

import importlib
ra = importlib.import_module('detectron2_tpu.ops.roi_align')


def bench(chunk, R=8000, C=256, res=7):
    rng = np.random.RandomState(0)
    feats = {
        "0": jnp.asarray(rng.rand(8, 200, 336, C), jnp.bfloat16),
        "1": jnp.asarray(rng.rand(8, 100, 168, C), jnp.bfloat16),
        "2": jnp.asarray(rng.rand(8, 50, 84, C), jnp.bfloat16),
        "3": jnp.asarray(rng.rand(8, 25, 42, C), jnp.bfloat16),
    }
    xy = rng.rand(R, 2) * 800
    wh = rng.rand(R, 2) * 200 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, 8, R), jnp.int32)
    levels = jnp.asarray(rng.randint(0, 4, R), jnp.int32)

    import functools

    orig = ra._chunked_bilinear_pool
    ra._chunked_bilinear_pool = functools.partial(orig, chunk=chunk)
    try:
        f = jax.jit(
            lambda ft, b, bi, lv: ra.roi_align_multilevel(
                ft, b, bi, lv, ("0", "1", "2", "3"), (0.25, 0.125, 0.0625, 0.03125), (res, res)
            )
        )
        out = f(feats, boxes, bidx, levels)
        float(np.asarray(out).sum())
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(feats, boxes, bidx, levels)
        float(np.asarray(out).sum())
        dt = (time.perf_counter() - t0) / 10
        print(f"chunk={chunk}: {dt * 1000:.2f} ms for {R} rois {res}x{res}x{C}")
    finally:
        ra._chunked_bilinear_pool = orig


for chunk in [512, 2048, 8192]:
    bench(chunk)
