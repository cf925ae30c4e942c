#!/usr/bin/env python
"""Training-stability check: 500 SGD iterations of Mask R-CNN R50-FPN-GN on
synthetic data must keep every loss finite and DECREASE the total loss.

The analogue of the reference's quick_schedules/*_training_acc_test protocol
(no dataset in this environment, so synthetic boxes/masks stand in). Uses the
scratch-training conventions (GN norm, true ImageNet PIXEL_STD, FREEZE_AT 0,
config parity with Misc/scratch_mask_rcnn_R_50_FPN_*_gn.yaml): the default
FrozenBN + PIXEL_STD=[1,1,1] convention is only sound when loading pretrained
MSRA stems, not for random init.

Usage: python tools/check_train_stability.py [--iters 500] [--size 256]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true", help="force CPU (tiny model)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.parallel import TrainState, make_train_step
    from detectron2_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.NORM = "GN"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.MAX_ITER = args.iters
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.STEPS = (int(args.iters * 0.7),)
    model = build_model(cfg)

    B, H, W, G = args.batch, args.size, args.size, 8
    rng = np.random.RandomState(0)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        xy = r.rand(B, G, 2) * (W * 0.6)
        wh = r.rand(B, G, 2) * (W * 0.3) + 8
        return {
            "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)).astype(np.uint8)),
            "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
            "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            "gt_classes": jnp.asarray(r.randint(0, 80, (B, G)).astype(np.int32)),
            "gt_valid": jnp.ones((B, G), bool),
            "gt_masks": jnp.asarray((r.rand(B, G, 28, 28) > 0.5).astype(np.float32)),
        }

    # a small pool of fixed synthetic batches the model can actually fit
    batches = [make_batch(s) for s in range(8)]

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batches[0]),
        train=True,
    )
    state = TrainState.create(params, build_optimizer(cfg, params))
    step = make_train_step(model)
    key = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    first_losses, window = None, []
    for i in range(args.iters):
        state, losses = step(state, batches[i % len(batches)], jax.random.fold_in(key, i))
        if i % 50 == 0 or i == args.iters - 1:
            tl = float(np.asarray(losses["total_loss"]))
            assert np.isfinite(tl), f"non-finite total loss at iter {i}: {losses}"
            print(f"iter {i:4d}  total_loss {tl:.4f}  ({time.perf_counter() - t0:.0f}s)")
        if i < 20:
            first_losses = float(np.asarray(losses["total_loss"])) if first_losses is None else first_losses
        if i >= args.iters - 20:
            window.append(float(np.asarray(losses["total_loss"])))

    final = float(np.mean(window))
    print(f"initial {first_losses:.4f} -> final(avg last 20) {final:.4f}")
    assert np.isfinite(final)
    assert final < first_losses * 0.8, (
        f"loss did not decrease enough: {first_losses:.4f} -> {final:.4f}"
    )
    print("STABILITY CHECK PASSED")


if __name__ == "__main__":
    main()
