"""Train-step time breakdown by ablation: times fwd+bwd of nested model
subsets at production shapes (batch 8, 800x1344) to locate the train-path
bottleneck. Dev tool, TPU-only."""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def timeit(fn, *args, n=6):
    fn(*args)  # compile
    # sync via tiny readback (tunnel: block_until_ready is not a real sync)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.MODEL.MASK_ON = True
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
    params = variables["params"]
    key = jax.random.PRNGKey(3)

    bound = model.bind(variables, rngs={"sampling": key})
    mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)

    def preprocess(img):
        return ((img.astype(jnp.float32) - mean) / std).astype(jnp.bfloat16)

    # 1. backbone+FPN fwd+bwd
    @jax.jit
    def bb_step(p, img):
        def loss(p):
            feats = model.bind({**variables, "params": p}).backbone(preprocess(img), train=True)
            return sum((f.astype(jnp.float32) ** 2).mean() for f in feats.values())

        return jax.grad(loss)(p)

    t_bb = timeit(bb_step, params, batch["image"])

    # 2. full model fwd+bwd (loss -> grads, no optimizer)
    @jax.jit
    def full_step(p, b, k):
        def loss(p):
            losses = model.apply(
                {**variables, "params": p}, b, train=True, rngs={"sampling": k}
            )
            return sum(v for k2, v in losses.items() if k2 != "total_loss")

        return jax.grad(loss)(p)

    t_full = timeit(full_step, params, batch, key)

    # 3. full + optax sgd update (= the production train step w/o psum)
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, s, b, k):
        def loss(p):
            losses = model.apply(
                {**variables, "params": p}, b, train=True, rngs={"sampling": k}
            )
            return sum(v for k2, v in losses.items() if k2 != "total_loss")

        g = jax.grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd)

    t_train = timeit(train_step, params, opt_state, batch, key)

    print(f"backbone+FPN fwd+bwd: {t_bb:.1f} ms")
    print(f"full model fwd+bwd:   {t_full:.1f} ms  (heads+rpn = {t_full - t_bb:.1f} ms)")
    print(f"+ sgd update:         {t_train:.1f} ms  ({B / t_train * 1e3:.2f} img/s)")


if __name__ == "__main__":
    main()
