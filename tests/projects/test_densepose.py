"""DensePose chart-head project tests."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.densepose import add_densepose_config


def _cfg():
    cfg = get_cfg()
    add_densepose_config(cfg)
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
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1  # person
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_CONV_DIMS = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DECODER_NUM_CLASSES = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_densepose_rcnn_train_and_infer():
    model = build_model(_cfg())

    rng = np.random.RandomState(0)
    G, P = 3, 10
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    part = rng.randint(0, 24, (1, G, P)).astype(np.int32)
    part[0, :, -2:] = -1  # padded point slots
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(np.zeros((1, G), np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_dp_points": jnp.asarray(pts),
        "gt_dp_part": jnp.asarray(part),
        "gt_dp_u": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
        "gt_dp_v": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ["loss_densepose_I", "loss_densepose_S", "loss_densepose_U", "loss_densepose_V"]:
        assert k in losses, losses.keys()
        assert np.isfinite(float(losses[k])), k

    det = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    # pooled 14 -> deconv 28 -> bilinear UP_SCALE 56 (reference chart predictor)
    assert det["pred_densepose"].shape == (1, 8, 56, 56, 3)
    dp = np.asarray(det["pred_densepose"])
    assert np.isfinite(dp).all()
    assert (dp[..., 1:] >= 0).all() and (dp[..., 1:] <= 1).all()


def test_uv_confidence_losses():
    """Confidence NLLs (reference chart_with_confidences.py): at zero error
    and fixed sigma, the iso loss equals its analytic value; higher sigma at
    nonzero error trades penalty correctly; aniso reduces to iso at kappa=0."""
    from detectron2_tpu.projects.densepose import (
        iid_isotropic_gaussian_uv_loss,
        indep_anisotropic_gaussian_uv_loss,
    )

    P = 16
    u = jnp.zeros((1, P))
    v = jnp.zeros((1, P))
    w = jnp.ones((1, P))
    sig = jnp.full((1, P), 0.0)  # softplus(0) = log 2
    lb = 0.01
    sigma2 = np.log(2) + lb
    expected = 0.5 * (np.log(2 * np.pi) + 2 * np.log(sigma2))
    got = float(iid_isotropic_gaussian_uv_loss(u, v, sig, u, v, w, lb))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # aniso with kappa=0 == iso
    k0 = jnp.zeros((1, P))
    tu = u + 0.3
    iso = float(iid_isotropic_gaussian_uv_loss(u, v, sig, tu, v, w, lb))
    aniso = float(indep_anisotropic_gaussian_uv_loss(u, v, sig, k0, k0, tu, v, w, lb))
    np.testing.assert_allclose(aniso, iso, rtol=1e-5)

    # error along r is discounted relative to orthogonal error
    ku = jnp.full((1, P), 2.0)
    along = float(indep_anisotropic_gaussian_uv_loss(u, v, sig, ku, k0, tu, v, w, lb))
    ortho = float(indep_anisotropic_gaussian_uv_loss(u, v, sig, k0, ku, tu, v, w, lb))
    assert along < ortho


def test_cse_embedding_loss_learns_identity():
    """The softmax embedding loss is minimized when pixel embeddings equal
    their GT vertex embeddings, and padded points are ignored."""
    from detectron2_tpu.projects.densepose import cse_embedding_loss, normalize_embeddings

    rng = np.random.RandomState(0)
    K, D, P = 32, 8, 12
    mesh = normalize_embeddings(jnp.asarray(rng.randn(K, D).astype(np.float32)))
    ids = jnp.asarray(rng.randint(0, K, P).astype(np.int32))
    valid = jnp.ones(P, bool)

    perfect = mesh[ids]
    rand = jnp.asarray(rng.randn(P, D).astype(np.float32))
    l_good = float(cse_embedding_loss(perfect, ids, valid, mesh, 0.01))
    l_bad = float(cse_embedding_loss(rand, ids, valid, mesh, 0.01))
    assert l_good < l_bad

    # invalid points don't contribute: corrupting them changes nothing
    valid2 = valid.at[0].set(False)
    l1 = float(cse_embedding_loss(perfect, ids, valid2, mesh, 0.01))
    corrupted = perfect.at[0].set(-perfect[0])
    l2 = float(cse_embedding_loss(corrupted, ids, valid2, mesh, 0.01))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_closest_vertices_roundtrip():
    from detectron2_tpu.projects.densepose import (
        closest_vertices_from_embedding,
        normalize_embeddings,
    )

    rng = np.random.RandomState(1)
    K, D = 64, 8
    mesh = normalize_embeddings(jnp.asarray(rng.randn(K, D).astype(np.float32)))
    ids = rng.randint(0, K, (5, 7))
    out = closest_vertices_from_embedding(mesh[jnp.asarray(ids)], mesh, chunk=16)
    np.testing.assert_array_equal(np.asarray(out), ids)


def test_densepose_cse_train_and_infer():
    """CSE head end-to-end: embedding loss + coarse segm at train, per-pixel
    embeddings at inference."""
    cfg = _cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseEmbeddingPredictor"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE = 8
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS = [["testmesh", 64]]
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G, P = 3, 10
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    vert = rng.randint(0, 64, (1, G, P)).astype(np.int32)
    vert[0, :, -2:] = -1
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(np.zeros((1, G), np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_dp_points": jnp.asarray(pts),
        "gt_dp_vertex": jnp.asarray(vert),
    }
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    losses = model.apply(v, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_densepose_E_testmesh" in losses and "loss_densepose_S" in losses
    assert all(np.isfinite(float(x)) for x in losses.values())

    out = model.apply(
        v, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert "pred_densepose_embedding" in out and "pred_densepose_fg" in out
    assert out["pred_densepose_embedding"].shape[-1] == 8


def test_densepose_gps_evaluator_perfect_prediction():
    """Engine-backed evaluator: a detection reproducing the GT chart points
    (and coarse mask) scores AP=100 in GPS, GPSM and IOU modes on synthetic
    mesh tables; a wrong-part prediction scores 0 in GPS."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from densepose_eval_synth import make_mesh_tables

    from detectron2_tpu.data import MetadataCatalog
    from detectron2_tpu.evaluation.rle import mask_to_rle
    from detectron2_tpu.projects.densepose import DensePoseCOCOEvaluator, GeodesicMeshTables

    tables = GeodesicMeshTables(**make_mesh_tables())
    MetadataCatalog.get("dp_eval_test")  # register empty metadata
    ev = DensePoseCOCOEvaluator("dp_eval_test", tables, mode="all")

    rng = np.random.RandomState(0)
    M, npts = 28, 20
    gt_bbox = [10.0, 20.0, 56.0, 48.0]
    dp_x = rng.rand(npts) * 255
    dp_y = rng.rand(npts) * 255
    dp_I = rng.randint(1, 5, npts)
    dp_U = rng.rand(npts)
    dp_V = rng.rand(npts)
    # full-box coarse mask (one part RLE covering the whole 256x256 frame)
    dp_masks = [mask_to_rle(np.ones((256, 256), np.uint8))] + [None] * 13
    gt = {
        "bbox": gt_bbox,
        "dp_x": dp_x,
        "dp_y": dp_y,
        "dp_I": dp_I,
        "dp_U": dp_U,
        "dp_V": dp_V,
        "dp_masks": dp_masks,
    }

    # perfect prediction: quantized [3, h, w] stack painted with the exact
    # gt IUV at the pixels the protocol reads the gt points from
    h, w = int(gt_bbox[3]), int(gt_bbox[2])
    labels = np.ones((h, w), np.uint8)  # fg everywhere -> mask IoU 1
    u8 = np.zeros((h, w), np.uint8)
    v8 = np.zeros((h, w), np.uint8)
    px = (dp_x * gt_bbox[2] / 255.0).astype(int)
    py = (dp_y * gt_bbox[3] / 255.0).astype(int)
    # avoid collisions overwriting each other with different parts: paint
    # in reverse so the first point wins, matching nothing in particular —
    # instead just deduplicate pixels by keeping the last write on BOTH the
    # gt side and dt side (the engine reads the same pixel for both)
    labels[py, px] = dp_I
    u8[py, px] = np.minimum(255, np.round(dp_U * 255.0)).astype(np.uint8)
    v8[py, px] = np.minimum(255, np.round(dp_V * 255.0)).astype(np.uint8)
    # gt points whose pixel was overwritten by a later point would mismatch;
    # re-read the painted maps as the gt labels so dt == gt at every point
    dp_I = labels[py, px].astype(int)
    dp_U = u8[py, px] / 255.0
    dp_V = v8[py, px] / 255.0
    gt.update({"dp_I": dp_I, "dp_U": dp_U, "dp_V": dp_V})
    iuv = np.stack([labels, u8, v8])

    ev.set_ground_truth({0: [gt]}, image_sizes={0: (128, 128)})
    ev.reset()
    ev.process(
        None,
        [{"image_id": 0, "instances": [{"bbox": gt_bbox, "score": 0.9, "densepose": iuv}]}],
    )
    res = ev.evaluate()
    np.testing.assert_allclose(res["densepose_gps"]["AP"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["densepose_gpsm"]["AP"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["densepose_segm"]["AP"], 100.0, atol=1e-6)

    # a detection with wrong parts everywhere: gps ~0 but the mask is still
    # perfect, so the segm (IOU-mode) AP stays 100
    bad = iuv.copy()
    bad[0] = (bad[0] + 7) % 24 + 1
    ev.reset()
    ev.process(
        None,
        [{"image_id": 0, "instances": [{"bbox": gt_bbox, "score": 0.9, "densepose": bad}]}],
    )
    res_bad = ev.evaluate()
    assert res_bad["densepose_gps"]["AP"] < 50.0
    np.testing.assert_allclose(res_bad["densepose_segm"]["AP"], 100.0, atol=1e-6)

    # the [M, M, 3] float chart-grid format goes through the resampling
    # path in process(); constant part/UV makes it exact regardless of
    # pixel alignment
    const_gt = {
        "bbox": gt_bbox,
        "dp_x": dp_x,
        "dp_y": dp_y,
        "dp_I": np.full(npts, 3),
        "dp_U": np.full(npts, 0.4),
        "dp_V": np.full(npts, 0.6),
        "dp_masks": dp_masks,
    }
    grid = np.zeros((M, M, 3), np.float32)
    grid[..., 0] = 3
    grid[..., 1] = 0.4
    grid[..., 2] = 0.6
    ev2 = DensePoseCOCOEvaluator("dp_eval_test", tables, mode="gps")
    ev2.set_ground_truth({0: [const_gt]}, image_sizes={0: (128, 128)})
    ev2.reset()
    ev2.process(
        None,
        [{"image_id": 0, "instances": [{"bbox": gt_bbox, "score": 0.9, "densepose": grid}]}],
    )
    res2 = ev2.evaluate()
    np.testing.assert_allclose(res2["densepose_gps"]["AP"], 100.0, atol=1e-6)


def test_densepose_chart_confidence_train():
    """Chart head with iid_iso UV confidence: sigma channel + UV NLL loss."""
    cfg = _cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE = "iid_iso"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    G, P = 3, 10
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    part = rng.randint(0, 24, (1, G, P)).astype(np.int32)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(np.zeros((1, G), np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_dp_points": jnp.asarray(pts),
        "gt_dp_part": jnp.asarray(part),
        "gt_dp_u": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
        "gt_dp_v": jnp.asarray(rng.rand(1, G, P).astype(np.float32)),
    }
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    losses = model.apply(v, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_densepose_UV" in losses and "loss_densepose_U" not in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_mesh_alignment_evaluator_synthetic():
    """MeshAlignmentEvaluator (reference mesh_alignment_evaluator.py:16-68)
    on two synthetic meshes: identical embeddings align perfectly (GE=0,
    GPS=1); swapping one mesh's key-vertex embeddings produces exactly the
    geodesic distance between the two key vertices."""
    from detectron2_tpu.projects.densepose import MeshAlignmentEvaluator

    V, D = 6, 6
    eye = np.eye(V, D, dtype=np.float32)
    keyverts = {"m1": {"nose": 0, "tail": 1}, "m2": {"nose": 0, "tail": 1}}
    geod = np.zeros((V, V), np.float32)
    geod[0, 1] = geod[1, 0] = 0.3

    class MeshStub:
        def __init__(self, g):
            self.geodists = g

    # perfectly aligned embeddings
    ev = MeshAlignmentEvaluator(
        embedder=lambda name: eye,
        mesh_names=["m1", "m2"],
        mesh_keyvertices=keyverts,
        mesh_loader=lambda name: MeshStub(geod),
    )
    ge, gps, per_mesh = ev.evaluate()
    np.testing.assert_allclose(ge, 0.0, atol=1e-7)
    np.testing.assert_allclose(gps, 1.0, atol=1e-7)
    assert set(per_mesh["GE"]) == {"m1", "m2"}

    # m2's nose/tail embeddings swapped: m1's nose matches m2's tail vertex
    swapped = eye.copy()
    swapped[[0, 1]] = swapped[[1, 0]]
    ev2 = MeshAlignmentEvaluator(
        embedder=lambda name: swapped if name == "m2" else eye,
        mesh_names=["m1", "m2"],
        mesh_keyvertices=keyverts,
        mesh_loader=lambda name: MeshStub(geod),
    )
    ge2, gps2, _ = ev2.evaluate()
    np.testing.assert_allclose(ge2, 0.3, atol=1e-6)
    np.testing.assert_allclose(gps2, float(np.exp(-0.09 / (2 * 0.255**2))), atol=1e-6)


def test_densepose_inference_slot_cap():
    """MAX_INFERENCE_INSTANCES: the dp head runs only on the top-K
    score-sorted detection slots — outputs on those slots are identical to
    the uncapped run, the rest are zero (background). K >= the metric's
    maxDets=20, so the default cap is metric-lossless while cutting the
    padded head cost ~4x."""
    cfg_full = _cfg()
    cfg_full.MODEL.ROI_DENSEPOSE_HEAD.MAX_INFERENCE_INSTANCES = 0  # every slot
    cfg_cap = _cfg()
    cfg_cap.MODEL.ROI_DENSEPOSE_HEAD.MAX_INFERENCE_INSTANCES = 3

    model_full = build_model(cfg_full)
    model_cap = build_model(cfg_cap)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
    }
    variables = model_full.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=False
    )
    det_full = model_full.apply(variables, batch, train=False)
    det_cap = model_cap.apply(variables, batch, train=False)  # same params

    full = np.asarray(det_full["pred_densepose"])
    cap = np.asarray(det_cap["pred_densepose"])
    assert full.shape == cap.shape  # [1, D, M, M, 3]
    np.testing.assert_allclose(cap[:, :3], full[:, :3], rtol=1e-5, atol=1e-5)
    assert (cap[:, 3:] == 0).all()
    # detection fields themselves are untouched
    np.testing.assert_array_equal(
        np.asarray(det_full["pred_boxes"]), np.asarray(det_cap["pred_boxes"])
    )
