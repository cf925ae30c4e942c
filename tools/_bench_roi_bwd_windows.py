"""Measure the Pallas RoIAlign backward at different window geometries.

The RMW traffic is proportional to YH*XW, but windows smaller than a roi's
sampling footprint clamp gradient like the forward clamps samples — exactness
vs the forward's own (48, 64) geometry is only kept at (48, 64).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/_bench_roi_bwd_windows.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), out, 0.0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), out, 0.0))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B, C = 8, 256
    H0, W0 = 200, 336
    shapes = [(B, H0 // 2**i, W0 // 2**i, C) for i in range(4)]
    level_order = ("p2", "p3", "p4", "p5")
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rng = np.random.RandomState(0)
    features = {
        n: jnp.asarray(rng.standard_normal(s).astype(np.float32), jnp.bfloat16)
        for n, s in zip(level_order, shapes)
    }

    from detectron2_tpu.modeling.poolers import assign_boxes_to_levels
    from detectron2_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_backward

    for R, out_size, tag in [(4096, 7, "box"), (1024, 14, "mask")]:
        cx = rng.uniform(30, 1200, R)
        cy = rng.uniform(30, 700, R)
        half = rng.uniform(8, 200, (2, R))
        boxes = jnp.asarray(
            np.stack([cx - half[0], cy - half[1], cx + half[0], cy + half[1]], axis=1).astype(
                np.float32
            )
        )
        batch_idx = jnp.asarray(rng.randint(0, B, R), jnp.int32)
        levels = assign_boxes_to_levels(boxes, 2, 5)
        g = jnp.asarray(
            rng.standard_normal((R, out_size, out_size, C)).astype(np.float32), jnp.bfloat16
        )

        for yw, xw in [(48, 64), (32, 40), (24, 32), (16, 24)]:
            fn = jax.jit(
                lambda g, f, b, bi, lv, yw=yw, xw=xw: roi_align_pallas_backward(
                    g, f, b, bi, lv, level_order, scales, out_size, 2,
                    y_window=yw, x_window=xw,
                )
            )
            t = bench(fn, g, features, boxes, batch_idx, levels)
            # gradient mass kept vs the exact (48, 64) geometry
            full = roi_align_pallas_backward(
                g, features, boxes, batch_idx, levels, level_order, scales, out_size, 2
            )
            tight = roi_align_pallas_backward(
                g, features, boxes, batch_idx, levels, level_order, scales, out_size, 2,
                y_window=yw, x_window=xw,
            )
            num = sum(float(jnp.sum(jnp.abs(tight[n].astype(jnp.float32)))) for n in level_order)
            den = sum(float(jnp.sum(jnp.abs(full[n].astype(jnp.float32)))) for n in level_order)
            print(f"{tag}: window ({yw:2d},{xw:2d})  {t:8.2f} ms   grad-mass {num/den:.4f}")


if __name__ == "__main__":
    main()
