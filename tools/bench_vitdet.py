#!/usr/bin/env python
"""Benchmark: ViTDet ViT-B Mask R-CNN COCO inference throughput on one chip.

Prints ONE json line like bench.py. Baseline: the reference publishes
0.079 s/im on an A100-class GPU with AMP for ViTDet-B Mask R-CNN
(projects/ViTDet/README.md:28-38) = 12.66 img/s.

The ViT runs at 1024x1024 (ViTDet pads square); global-attention blocks
(S=4096) take the Pallas flash-attention path.
"""

import json
import time

import numpy as np

VITDET_B_A100_IMG_S = 1.0 / 0.079  # 12.66 img/s (reference README)


def main():
    import jax
    import jax.numpy as jnp

    from detectron2_tpu.config import LazyConfig, instantiate

    cfg = LazyConfig.load("configs/ViTDet/mask_rcnn_vitdet_b_100ep.py")
    model = instantiate(cfg.model)

    B, H, W = 8, 1024, 1024
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8)),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        {"image": batch["image"][:1], "image_sizes": batch["image_sizes"][:1]},
        train=False,
    )

    from detectron2_tpu.utils.analysis import compile_with_flops, mfu

    fwd, flops_per_batch = compile_with_flops(
        lambda p, b: model.apply(p, b, train=False), params, batch
    )

    @jax.jit
    def _digest(o):
        d = o["scores"].sum() + o["pred_boxes"].sum()
        if "pred_masks_full" in o:
            d = d + o["pred_masks_full"][:, :, ::37, ::53].sum(dtype=jnp.int32).astype(jnp.float32)
        elif "pred_masks" in o:
            d = d + o["pred_masks"].sum()
        return d

    def sync(o):
        return float(np.asarray(_digest(o)))

    out = fwd(params, batch)
    sync(out)

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, batch)
    sync(out)
    dt = time.perf_counter() - t0

    img_s = B * iters / dt
    record = {
        "metric": "vitdet_b_maskrcnn_inference_img_per_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / VITDET_B_A100_IMG_S, 3),
    }
    if flops_per_batch > 0:
        record["tflops_per_im"] = round(flops_per_batch / B / 1e12, 3)
        u = mfu(flops_per_batch, dt / iters)
        if u is not None:
            record["mfu"] = round(u, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
