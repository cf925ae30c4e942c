#!/usr/bin/env python
"""Generic zoo benchmark: time any config's inference (or train step) on the
real chip and print ONE json line with img/s, TFLOP/im (XLA cost analysis of
the timed executable), and MFU.

Covers the BASELINE.md rows the dedicated scripts don't (RetinaNet, keypoint,
panoptic, Faster R-CNN C4/FPN, ViTDet train): the reference publishes
train s/iter + inference s/im for each zoo row (reference MODEL_ZOO.md
"Common Settings"); this tool produces the per-chip counterpart for ours.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_zoo.py \
      --config COCO-Detection/retinanet_R_50_FPN_3x.yaml \
      --batch 16 --baseline-s-im 0.041 [--train] [--iters 20]

.py configs load through LazyConfig, .yaml through model_zoo/get_cfg.
"""

import argparse
import json
import time

import numpy as np


def build(config_path, opts=()):
    if config_path.endswith(".py"):
        from detectron2_tpu.config import LazyConfig, instantiate

        cfg = LazyConfig.load(config_path)
        model = instantiate(cfg.model)
        return cfg, model, True
    from detectron2_tpu import model_zoo
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model

    try:
        cfg = model_zoo.get_config(config_path)
    except Exception:
        cfg = get_cfg()
        if "DensePose" in config_path:
            from detectron2_tpu.projects.densepose import add_densepose_config

            add_densepose_config(cfg)
        cfg.merge_from_file(config_path)
    if opts:
        cfg.defrost()
        cfg.merge_from_list(list(opts))
    cfg.MODEL.WEIGHTS = ""
    model = build_model(cfg)
    return cfg, model, False


def make_batch(B, H, W, train, num_classes, with_masks, with_keypoints, with_sem_seg, seed=0,
               with_densepose=False):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8)),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
    }
    if train:
        G = 50
        xy = rng.rand(B, G, 2) * (min(H, W) * 0.7)
        wh = rng.rand(B, G, 2) * (min(H, W) * 0.3) + 16
        batch.update(
            gt_boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            gt_classes=jnp.asarray(rng.randint(0, num_classes, (B, G)).astype(np.int32)),
            gt_valid=jnp.ones((B, G), bool),
        )
        if with_masks:
            batch["gt_masks"] = jnp.asarray((rng.rand(B, G, 28, 28) > 0.5).astype(np.float32))
        if with_keypoints:
            kx = xy[..., :1] + rng.rand(B, G, 17) * wh[..., :1]
            ky = xy[..., 1:] + rng.rand(B, G, 17) * wh[..., 1:]
            kv = np.full((B, G, 17), 2.0)
            batch["gt_keypoints"] = jnp.asarray(
                np.stack([kx, ky, kv], axis=-1).astype(np.float32)
            )
        if with_sem_seg:
            batch["gt_sem_seg"] = jnp.asarray(rng.randint(0, 54, (B, H, W)).astype(np.int32))
        if with_densepose:
            # chart targets: P annotated points per gt box (COCO-DensePose
            # averages ~100 points/person; the loss cost scales with P).
            # vertex/mesh ids ride along for the CSE family (ignored by the
            # chart losses).
            P = 100
            frac = rng.rand(B, G, P, 2).astype(np.float32)
            pts = xy[..., None, :] + frac * wh[..., None, :]
            batch["gt_dp_points"] = jnp.asarray(pts.astype(np.float32))
            batch["gt_dp_part"] = jnp.asarray(rng.randint(1, 25, (B, G, P)).astype(np.int32))
            batch["gt_dp_u"] = jnp.asarray(rng.rand(B, G, P).astype(np.float32))
            batch["gt_dp_v"] = jnp.asarray(rng.rand(B, G, P).astype(np.float32))
            batch["gt_dp_vertex"] = jnp.asarray(
                rng.randint(0, 27554, (B, G, P)).astype(np.int64)
            )
            batch["gt_dp_mesh_id"] = jnp.asarray(np.zeros((B, G), np.int64))
    return batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="800,1344")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--baseline-s-im", type=float, default=0.0,
                    help="reference published s/im (inference) or s/it/batch-16 (train)")
    ap.add_argument("--baseline-img-s", type=float, default=0.0,
                    help="reference per-chip img/s directly (overrides --baseline-s-im; "
                    "use for rows whose published s/it is not the 8xV100 batch-16 convention)")
    ap.add_argument("--use-checkpoint", action="store_true",
                    help="enable backbone remat (lazy ViT configs) for train benches")
    ap.add_argument("--metric", default="", help="metric name override")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="yacs KEY VALUE overrides applied after the config file "
                    "(e.g. MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_LOSS_NAME EmbeddingLoss)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.use_checkpoint:
        # must be set before instantiate -> patch the loader path
        from detectron2_tpu.config import LazyConfig, instantiate

        cfg = LazyConfig.load(args.config)
        cfg.model.backbone.net.use_checkpoint = True
        model = instantiate(cfg.model)
        is_lazy = True
    else:
        cfg, model, is_lazy = build(args.config, args.opts)
    H, W = (int(s) for s in args.hw.split(","))
    B = args.batch

    if is_lazy:
        num_classes, with_masks, with_keypoints, with_sem_seg = 80, True, False, False
        compute_dtype = "bfloat16"
    else:
        num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        with_masks = cfg.MODEL.MASK_ON
        with_keypoints = cfg.MODEL.KEYPOINT_ON
        with_sem_seg = cfg.MODEL.META_ARCHITECTURE in ("PanopticFPN", "SemanticSegmentor")
        compute_dtype = cfg.TPU.COMPUTE_DTYPE
    with_densepose = (not is_lazy) and getattr(cfg.MODEL, "DENSEPOSE_ON", False)
    batch = make_batch(
        B, H, W, args.train, num_classes, with_masks, with_keypoints, with_sem_seg,
        with_densepose=with_densepose,
    )

    init_batch = jax.tree_util.tree_map(lambda x: x[:1], batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        init_batch,
        train=args.train,
    )

    from detectron2_tpu.utils.analysis import compile_with_flops, mfu

    if args.train:
        from detectron2_tpu.parallel import TrainState, make_train_step
        import optax

        if is_lazy and hasattr(cfg, "optimizer"):
            cfg.optimizer.params = params
            from detectron2_tpu.config import instantiate

            tx = instantiate(cfg.optimizer)
        elif not is_lazy:
            from detectron2_tpu.solver import build_optimizer

            cfg.SOLVER.MAX_ITER = 1000
            tx = build_optimizer(cfg, params)
        else:
            tx = optax.sgd(0.01, momentum=0.9)
        state = TrainState.create(params, tx)
        step = make_train_step(model)
        key = jax.random.PRNGKey(3)
        compiled = step.lower(state, batch, key).compile()
        flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))

        state, losses = compiled(state, batch, key)
        sync = lambda l: float(np.asarray(l["total_loss"]))
        sync(losses)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, losses = compiled(state, batch, jax.random.fold_in(key, i))
        sync(losses)
        dt = (time.perf_counter() - t0) / args.iters
    else:
        fwd, flops = compile_with_flops(
            lambda p, b: model.apply(p, b, train=False), params, batch
        )

        @jax.jit
        def _digest(o):
            d = jnp.asarray(0.0, jnp.float32)
            for k in ("scores", "pred_boxes"):
                if k in o:
                    d = d + o[k].sum().astype(jnp.float32)
            if "pred_masks_full" in o:
                d = d + o["pred_masks_full"][:, :, ::37, ::53].sum(dtype=jnp.int32).astype(jnp.float32)
            elif "pred_masks" in o:
                d = d + o["pred_masks"].sum().astype(jnp.float32)
            for k in ("sem_seg", "pred_keypoints"):
                if k in o:
                    d = d + o[k].sum().astype(jnp.float32)
            return d

        sync = lambda o: float(np.asarray(_digest(o)))
        out = fwd(params, batch)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, batch)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters

    img_s = B / dt
    name = args.metric or (
        args.config.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        + ("_train" if args.train else "_inference")
    )
    record = {
        "metric": name + "_img_per_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "ms_per_iter": round(dt * 1000, 1),
    }
    if args.baseline_img_s > 0:
        record["vs_baseline"] = round(img_s / args.baseline_img_s, 3)
    elif args.baseline_s_im > 0:
        base_img_s = (16 / args.baseline_s_im) / 8 if args.train else 1.0 / args.baseline_s_im
        record["vs_baseline"] = round(img_s / base_img_s, 3)
    if flops > 0:
        record["tflops_per_im"] = round(flops / B / 1e12, 3)
        u = mfu(flops, dt, dtype=compute_dtype)
        if u is not None:
            record["mfu"] = round(u, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
