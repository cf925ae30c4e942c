"""Train-step device-time measurement: chain N steps in one lax.scan so the
tunnel's per-call latency cancels; then dump a profiler trace of one step for
op-level attribution. Dev tool, TPU-only."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.parallel import TrainState, make_train_step
    from detectron2_tpu.solver import build_optimizer

    mask_on = "--no-mask" not in sys.argv

    # the PRODUCTION FPN config (box pooler 7x7, pre-NMS 2000/level) — the
    # yacs defaults are the C4 conventions (14x14, 12000) and overstate the
    # pooler-backward + NMS cost ~4x
    cfg = get_cfg()
    cfg.merge_from_file("configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    cfg.MODEL.WEIGHTS = ""
    cfg.MODEL.MASK_ON = mask_on
    model = build_model(cfg)

    B, H, W, G = 8, 800, 1344, 50
    rng = np.random.RandomState(0)
    xy = rng.rand(B, G, 2) * 600
    wh = rng.rand(B, G, 2) * 300 + 16
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8)),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 80, (B, G)).astype(np.int32)),
        "gt_valid": jnp.ones((B, G), bool),
        "gt_masks": jnp.asarray((rng.rand(B, G, 28, 28) > 0.5).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        train=True,
    )
    state = TrainState.create(variables, build_optimizer(cfg, variables))
    step = make_train_step(model, donate=False)

    N = 10

    @jax.jit
    def run_n(state, batch, key):
        def body(carry, i):
            st, _ = carry
            st, losses = step(st, batch, jax.random.fold_in(key, i))
            return (st, losses["total_loss"]), None

        (st, tl), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(N))
        return tl

    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    tl = run_n(state, batch, key)
    print(f"compile+first: {time.perf_counter() - t0:.0f}s, total_loss={float(tl):.3f}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(state, batch, key))
        times.append((time.perf_counter() - t0) / N * 1e3)
    ms = min(times)
    tag = "mask" if mask_on else "nomask"
    print(f"[{tag}] per-step device time: {ms:.1f} ms  ({B / ms * 1e3:.2f} img/s)")


if __name__ == "__main__":
    main()
