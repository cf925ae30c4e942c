"""PointRend project tests: point sampling math + e2e Mask R-CNN with
PointRendROIHeads."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.point_rend import add_pointrend_config
from detectron2_tpu.projects.point_rend.point_features import (
    get_uncertain_point_coords_on_grid,
    point_sample,
)


def test_point_sample_matches_manual_bilinear():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    # exact pixel centers must return the pixel values
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    coords = np.stack([(xs.ravel() + 0.5) / 8, (ys.ravel() + 0.5) / 8], -1)[None]
    coords = np.repeat(coords, 2, 0).astype(np.float32)
    out = np.asarray(point_sample(jnp.asarray(x), jnp.asarray(coords)))
    np.testing.assert_allclose(out.reshape(2, 8, 8, 3), x, rtol=1e-5, atol=1e-5)

    # midpoint between two pixel centers = their average
    mid = jnp.asarray([[[1.0 / 8, 0.5 / 8]]])  # between x=0 (ctr 0.5/8) and x=1 (ctr 1.5/8)
    v = np.asarray(point_sample(jnp.asarray(x[:1]), mid))[0, 0]
    np.testing.assert_allclose(v, 0.5 * (x[0, 0, 0] + x[0, 0, 1]), rtol=1e-5)


def test_uncertain_point_coords_on_grid():
    unc = np.full((1, 4, 4), -10.0, np.float32)
    unc[0, 2, 3] = 0.0  # most certain... highest value = picked first by top_k
    unc[0, 1, 1] = -1.0
    idx, coords = get_uncertain_point_coords_on_grid(jnp.asarray(unc), 2)
    idx = np.asarray(idx)[0]
    assert idx[0] == 2 * 4 + 3 and idx[1] == 1 * 4 + 1
    np.testing.assert_allclose(np.asarray(coords)[0, 0], [(3 + 0.5) / 4, (2 + 0.5) / 4])


def _pointrend_cfg():
    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 4
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 16
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_pointrend_rcnn_train_and_infer():
    cfg = _pointrend_cfg()
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G = 4
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (1, G)).astype(np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_masks": jnp.asarray((rng.rand(1, G, 28, 28) > 0.5).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    for key in ["loss_mask", "loss_mask_point", "loss_cls", "loss_rpn_cls"]:
        assert key in losses, losses.keys()
        assert np.isfinite(float(losses[key])), key

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    # 7 -> 14 -> 28 subdivision
    assert det["pred_masks"].shape == (1, 8, 28, 28)
    assert np.isfinite(np.asarray(det["pred_masks"])).all()


def test_pointrend_semseg_head_train_and_infer():
    """PointRendSemSegHead (reference point_rend/semantic_seg.py): coarse CE
    + point CE at training; subdivision refinement recovers input stride at
    inference."""
    from detectron2_tpu.layers import ShapeSpec
    from detectron2_tpu.projects.point_rend.semantic_seg import PointRendSemSegHead

    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 7
    cfg.MODEL.POINT_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 32
    cfg.MODEL.POINT_HEAD.FC_DIM = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 64
    shapes = {"p2": ShapeSpec(channels=8, stride=4), "p3": ShapeSpec(channels=8, stride=8)}
    head = PointRendSemSegHead.from_config(cfg, shapes)

    rng = np.random.RandomState(0)
    feats = {
        "p2": jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32)),
        "p3": jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)),
    }
    targets = jnp.asarray(rng.randint(0, 7, (2, 64, 64)).astype(np.int32))
    params = head.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feats,
        targets,
        train=True,
    )
    _, losses = head.apply(
        params, feats, targets, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    assert set(losses) == {"loss_sem_seg", "loss_sem_seg_point"}
    assert all(np.isfinite(float(v)) for v in losses.values())

    logits, _ = head.apply(params, feats, train=False)
    assert logits.shape == (2, 64, 64, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_implicit_pointrend_dynamic_mlp_matches_manual():
    """ImplicitPointHead's dynamic MLP equals a hand-rolled per-instance MLP
    with the same parameter slicing (reference point_head.py:229-274)."""
    from detectron2_tpu.projects.point_rend.point_head import ImplicitPointHead

    head = ImplicitPointHead(
        num_classes=3,
        num_fc=2,
        channels=8,
        image_feature_channels=4,
        image_feature_enabled=True,
        positional_encoding_enabled=False,
    )
    assert head.in_channels == 4
    w_sizes, b_sizes = head._layer_sizes()
    assert w_sizes == [4 * 8, 8 * 8, 8 * 3] and b_sizes == [8, 8, 3]

    rng = np.random.RandomState(0)
    R, P = 2, 5
    fine = jnp.asarray(rng.randn(R, P, 4).astype(np.float32))
    coords = jnp.asarray(rng.rand(R, P, 2).astype(np.float32))
    params_vec = jnp.asarray(rng.randn(R, head.num_params).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), fine, coords, params_vec)
    out = np.asarray(head.apply(variables, fine, coords, params_vec))

    # manual per-instance forward
    for r in range(R):
        x = np.asarray(fine[r])  # [P, 4]
        off = 0
        ws = []
        for s, (cin, cout) in zip(w_sizes, [(4, 8), (8, 8), (8, 3)]):
            ws.append(np.asarray(params_vec[r, off : off + s]).reshape(cout, cin))
            off += s
        bs = []
        for s in b_sizes:
            bs.append(np.asarray(params_vec[r, off : off + s]))
            off += s
        for i, (w, b) in enumerate(zip(ws, bs)):
            x = x @ w.T + b
            if i < 2:
                x = np.maximum(x, 0)
        np.testing.assert_allclose(out[r], x, rtol=1e-4, atol=1e-5)


def test_implicit_pointrend_rcnn_train_and_infer():
    cfg = _pointrend_cfg()
    cfg.MODEL.ROI_HEADS.NAME = "ImplicitPointRendROIHeads"
    cfg.MODEL.ROI_MASK_HEAD.NAME = "ImplicitPointRendMaskHead"
    cfg.MODEL.POINT_HEAD.NAME = "ImplicitPointHead"
    cfg.MODEL.POINT_HEAD.FC_DIM = 16
    cfg.MODEL.POINT_HEAD.NUM_FC = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 49
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G = 4
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (1, G)).astype(np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_masks": jnp.asarray((rng.rand(1, G, 28, 28) > 0.5).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    for key in ["loss_mask_point", "loss_l2", "loss_cls", "loss_rpn_cls"]:
        assert key in losses, losses.keys()
        assert np.isfinite(float(losses[key])), key
    assert "loss_mask" not in losses  # no coarse mask head in the implicit variant

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    # init 7x7 grid -> 14 -> 28 subdivision
    assert det["pred_masks"].shape == (1, 8, 28, 28)
    assert np.isfinite(np.asarray(det["pred_masks"])).all()
