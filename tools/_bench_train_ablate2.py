"""Finer train-step ablation: which of RPN-losses / proposal-NMS / box head /
mask head costs the 1.8s gap over the backbone. Dev tool, TPU-only."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4):
    fn(*args)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model

    def make_cfg(mask_on=True):
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
        cfg.MODEL.MASK_ON = mask_on
        return cfg

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

    cfg = make_cfg()
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        train=True,
    )
    params = variables["params"]
    key = jax.random.PRNGKey(3)
    mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)

    def features(p, img, train=True):
        m = model.bind({"params": p})
        x = ((img.astype(jnp.float32) - mean) / std).astype(jnp.bfloat16)
        return m.backbone(x, train=train)

    # A. backbone + RPN (losses + proposal selection), grad
    @jax.jit
    def rpn_step(p, b, k):
        def loss(p):
            m = model.bind({"params": p}, rngs={"sampling": k})
            feats = features(p, b["image"])
            (boxes, logits, valid), losses = m.proposal_generator(
                feats, b["image_sizes"], b["gt_boxes"], b["gt_valid"], train=True
            )
            return sum(losses.values()) + 0.0 * boxes.sum()

        return jax.grad(loss)(p)

    t_rpn = timeit(rpn_step, params, batch, key)

    # B. same but WITHOUT the proposal NMS path (losses only)
    @jax.jit
    def rpn_losses_only(p, b, k):
        def loss(p):
            m = model.bind({"params": p}, rngs={"sampling": k})
            feats = features(p, b["image"])
            rpn = m.proposal_generator
            fl = [feats[f] for f in rpn.in_features]
            grid_sizes = [(f.shape[1], f.shape[2]) for f in fl]
            anchors = rpn.anchor_generator(grid_sizes)
            logits_l, deltas_l = rpn.head(fl, train=True)
            Bb = fl[0].shape[0]
            logits_l = [l.reshape(Bb, -1).astype(jnp.float32) for l in logits_l]
            deltas_l = [d.reshape(Bb, -1, 4).astype(jnp.float32) for d in deltas_l]
            losses = rpn.losses(
                anchors, logits_l, deltas_l, b["gt_boxes"], b["gt_valid"], b["image_sizes"], k
            )
            return sum(losses.values())

        return jax.grad(loss)(p)

    t_rpn_nonms = timeit(rpn_losses_only, params, batch, key)

    # C. full model without mask head
    cfg_nm = make_cfg(mask_on=False)
    model_nm = build_model(cfg_nm)
    vars_nm = model_nm.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        train=True,
    )

    @jax.jit
    def nomask_step(p, b, k):
        def loss(p):
            losses = model_nm.apply({"params": p}, b, train=True, rngs={"sampling": k})
            return sum(v for k2, v in losses.items() if k2 != "total_loss")

        return jax.grad(loss)(p)

    t_nomask = timeit(nomask_step, vars_nm["params"], batch, key)

    print(f"backbone+RPN losses (no proposal NMS): {t_rpn_nonms:.1f} ms")
    print(f"backbone+RPN full (with proposals):    {t_rpn:.1f} ms")
    print(f"full model w/o mask head:              {t_nomask:.1f} ms")


if __name__ == "__main__":
    main()
