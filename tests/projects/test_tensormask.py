"""swap_align2nat vs a direct (slow) numpy transcription of the op's math."""

import numpy as np

import jax.numpy as jnp

from detectron2_tpu.projects.tensormask import swap_align2nat


def _naive(x, lam, pad_val=-6.0):
    """x: [N, H, W, V*U] -> [N, H/lam, W/lam, V*lam * U*lam] per the kernel's
    quadrilinear formula."""
    N, H, W, C = x.shape
    V = U = int(round(C**0.5))
    xg = x.reshape(N, H, W, V, U)
    Vo, Uo, Ho, Wo = V * lam, U * lam, H // lam, W // lam

    def get(n, y, xx, v, u):
        if 0 <= y < H and 0 <= xx < W and 0 <= v < V and 0 <= u < U:
            return xg[n, y, xx, v, u]
        return pad_val

    out = np.zeros((N, Ho, Wo, Vo, Uo), np.float64)
    for n in range(N):
        for v in range(Vo):
            for u in range(Uo):
                for y in range(Ho):
                    for xx in range(Wo):
                        oy = y * lam + v - Vo / 2 + 0.5
                        ox = xx * lam + u - Uo / 2 + 0.5
                        ov = (v + 0.5) / lam - 0.5
                        ou = (u + 0.5) / lam - 0.5
                        yf, xf = int(np.floor(oy)), int(np.floor(ox))
                        vf, uf = int(np.floor(ov)), int(np.floor(ou))
                        ywc, xwc = oy - yf, ox - xf
                        vwc, uwc = ov - vf, ou - uf
                        acc = 0.0
                        for yi, yw in ((yf, 1 - ywc), (yf + 1, ywc)):
                            for xi, xw in ((xf, 1 - xwc), (xf + 1, xwc)):
                                for vi, vw in ((vf, 1 - vwc), (vf + 1, vwc)):
                                    for ui, uw in ((uf, 1 - uwc), (uf + 1, uwc)):
                                        acc += yw * xw * vw * uw * get(n, yi, xi, vi, ui)
                        out[n, y, xx, v, u] = acc
    return out.reshape(N, Ho, Wo, Vo * Uo)


def test_swap_align2nat_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 9).astype(np.float32)  # V=U=3, lam=2
    got = np.asarray(swap_align2nat(jnp.asarray(x), 2))
    want = _naive(x.astype(np.float64), 2)
    assert got.shape == (1, 2, 2, 36)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_swap_align2nat_identity_lambda1():
    """λ=1: pure align->nat shift; shapes preserved, finite output."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 6, 25).astype(np.float32)
    y = np.asarray(swap_align2nat(jnp.asarray(x), 1))
    assert y.shape == (2, 6, 6, 25)
    want = _naive(x.astype(np.float64), 1)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_assignment_rule_matches_reference_math():
    """tensormask_assignment vs an independent numpy transcription of the
    reference rule (arch.py:42-133): containment + scale + spatial +
    uniqueness."""
    import jax

    from detectron2_tpu.projects.tensormask import tensormask_assignment

    rng = np.random.RandomState(3)
    G, R = 5, 200
    gt = rng.rand(G, 4).astype(np.float32) * 60
    gt[:, 2:] = gt[:, :2] + rng.rand(G, 2) * 50 + 4
    anch = rng.rand(R, 4).astype(np.float32) * 50
    anch[:, 2:] = anch[:, :2] + rng.rand(R, 2) * 80 + 8
    units = (rng.randint(0, 3, R) * 8 + 8).astype(np.float32)
    min_anchor = 12.0

    def ref(gt, anch, units):
        contain = np.zeros((G, R), bool)
        scale = np.zeros((G, R), bool)
        spatial = np.zeros((G, R), bool)
        for g in range(G):
            for a in range(R):
                contain[g, a] = (
                    anch[a, 0] <= gt[g, 0] and anch[a, 1] <= gt[g, 1]
                    and anch[a, 2] >= gt[g, 2] and anch[a, 3] >= gt[g, 3]
                )
                upper = max(max(gt[g, 2] - gt[g, 0], gt[g, 3] - gt[g, 1]) * 2.0, min_anchor)
                asize = max(anch[a, 2] - anch[a, 0], anch[a, 3] - anch[a, 1]) - units[a]
                scale[g, a] = upper - asize >= 0
                gc = (gt[g, :2] + gt[g, 2:]) / 2
                ac = (anch[a, :2] + anch[a, 2:]) / 2
                spatial[g, a] = (((gc - ac) / units[a]) ** 2).sum() <= 1.0
        assign = (contain & scale & spatial).astype(np.int32)
        matched_vals = assign.max(0)
        matches = assign.argmax(0)
        labels = (matched_vals == 1).astype(np.int8)
        labels[assign.sum(0) > 1] = 0
        return matches, labels

    m_ref, l_ref = ref(gt, anch, units)
    m, l = tensormask_assignment(
        jnp.asarray(gt), jnp.ones(G, bool), jnp.asarray(anch), jnp.asarray(units), min_anchor
    )
    np.testing.assert_array_equal(np.asarray(l), l_ref)
    fg = l_ref == 1
    np.testing.assert_array_equal(np.asarray(m)[fg], m_ref[fg])


def test_tensormask_e2e_train_and_infer():
    """Tiny bipyramid TensorMask: losses finite at train, fixed-shape padded
    detections + uniform 28x28 anchor-frame masks at inference."""
    import jax

    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.modeling import build_model
    from detectron2_tpu.projects.tensormask import add_tensormask_config

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[24, 32], [48, 64], [96, 128]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p3", "p4", "p5"]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 9
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 2
    cfg.MODEL.TENSOR_MASK.CLS_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.MASK_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.ALIGNED_ON = True
    cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON = True
    cfg.MODEL.TENSOR_MASK.MASK_GT_BUDGETS = (8, 4, 4)
    cfg.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST = 200
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert model.mask_sizes == (3, 4)

    rng = np.random.RandomState(0)
    B, H, W, G = 2, 128, 128, 4
    xy = rng.rand(B, G, 2) * 60
    wh = rng.rand(B, G, 2) * 40 + 12
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, H, W, 3)).astype(np.float32)),
        "image_sizes": jnp.tile(jnp.asarray([[H, W]], jnp.int32), (B, 1)),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 9, (B, G)).astype(np.int32)),
        "gt_valid": jnp.ones((B, G), bool),
        "gt_masks": jnp.asarray((rng.rand(B, G, 28, 28) > 0.5).astype(np.float32)),
    }
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    losses = model.apply(v, batch, train=True)
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_mask"}
    assert all(np.isfinite(float(x)) for x in losses.values())

    # gradients flow through all three losses
    def total(p):
        l = model.apply({"params": p}, batch, train=True)
        return sum(l.values())

    g = jax.grad(total)(v["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    out = model.apply(
        v, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert out["pred_boxes"].shape == (B, 20, 4)
    assert out["pred_masks"].shape == (B, 20, 28, 28)
    assert out["mask_boxes"].shape == (B, 20, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
