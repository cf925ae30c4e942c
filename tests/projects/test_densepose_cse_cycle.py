"""CSE evolution tests: embedder specs (reference dict layout), cycle
consistency losses (shape2shape / pix2shape), mask-trained coarse segm, and
the multi-mesh embed-loss routing — pinned against direct transcriptions of
the reference formulas (torch CPU oracle, reference
densepose/modeling/losses/cycle_shape2shape.py + cycle_pix2shape.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.densepose import add_densepose_config
from detectron2_tpu.projects.densepose.cse import (
    build_cycle_mesh_data,
    embedder_specs_from_cfg,
    normalize_embeddings,
    pix_to_shape_cycle_loss,
    sample_fg_pixels,
    shape_to_shape_cycle_loss,
)


def _cse_cfg():
    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE = 8
    return cfg


# ------------------------------------------------------------ embedder specs


def test_embedder_specs_dict_layout():
    """The reference EMBEDDERS dict layout (cse config yaml) normalizes to
    canonical specs, sorted by mesh name."""
    from detectron2_tpu.config import CfgNode as CN

    cfg = _cse_cfg()
    emb = CN(new_allowed=True)
    emb.update(
        {
            "cat_64": CN(
                {
                    "TYPE": "vertex_feature",
                    "NUM_VERTICES": 64,
                    "FEATURE_DIM": 16,
                    "FEATURES_TRAINABLE": False,
                    "IS_TRAINABLE": True,
                }
            ),
            "dog_32": CN({"TYPE": "vertex_direct", "NUM_VERTICES": 32}),
        }
    )
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS = emb
    specs = embedder_specs_from_cfg(cfg)
    assert [s[0] for s in specs] == ["cat_64", "dog_32"]
    cat = specs[0]
    assert cat[1] == "vertex_feature" and cat[2] == 64 and cat[3] == 16
    assert cat[4] == 8 and cat[5] is False and cat[6] is True
    dog = specs[1]
    assert dog[1] == "vertex_direct" and dog[2] == 32


def test_embedder_specs_legacy_and_default():
    cfg = _cse_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS = [["m", 16]]
    specs = embedder_specs_from_cfg(cfg)
    assert specs == (("m", "vertex_direct", 16, 0, 8, False, True),)
    cfg2 = _cse_cfg()
    # empty default -> no embedders, like the reference's
    # build_densepose_embedder returning None (densepose/modeling/build.py:87)
    assert embedder_specs_from_cfg(cfg2) == ()


def test_vertex_feature_embedder_and_trainability():
    """vertex_feature embedders project a (fixed) feature buffer; meshes with
    IS_TRAINABLE False return stop-gradient'ed embeddings."""
    from detectron2_tpu.projects.densepose.cse import Embedder

    specs = (
        ("feat", "vertex_feature", 12, 6, 4, False, True),
        ("frozen", "vertex_direct", 10, 0, 4, False, False),
    )
    emb = Embedder(mesh_specs=specs)
    # init traces only the requested mesh; merge both meshes' variables
    v1 = emb.init(jax.random.PRNGKey(0), "feat")
    v2 = emb.init(jax.random.PRNGKey(0), "frozen")
    variables = {
        coll: {**v1.get(coll, {}), **v2.get(coll, {})}
        for coll in set(v1) | set(v2)
    }
    # feature buffer lives in the buffers collection (not trained)
    assert "buffers" in variables
    flat = jax.tree_util.tree_flatten_with_path(variables["buffers"])[0]
    assert any("features" in str(p) for p, _ in flat)

    # frozen mesh: gradient through its embeddings is zero
    def loss(params):
        v = {**variables, "params": params}
        return (emb.apply(v, "frozen") ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    g_frozen = jax.tree_util.tree_leaves(
        {k: v for k, v in g.items() if "frozen" in k}
    )
    assert all(np.allclose(np.asarray(x), 0) for x in g_frozen)


# ------------------------------------------------------------- cycle losses


def _torch_shape2shape(e1, g1, e2, g2, temperature, p):
    """Direct transcription of the reference formula
    (cycle_shape2shape.py:97-121) as a torch oracle."""
    import torch
    import torch.nn.functional as F

    e1, g1, e2, g2 = (torch.as_tensor(np.asarray(x)) for x in (e1, g1, e2, g2))
    sim = e1 @ e2.T
    c12 = F.softmax(sim / temperature, dim=1)
    c21 = F.softmax(sim.T / temperature, dim=1)
    return (
        torch.norm(g1 * (c12 @ c21), p=p) + torch.norm(g2 * (c21 @ c12), p=p)
    ).item()


def test_shape2shape_matches_reference_formula():
    rng = np.random.RandomState(0)
    e1 = np.asarray(normalize_embeddings(jnp.asarray(rng.randn(20, 8), jnp.float32)))
    e2 = np.asarray(normalize_embeddings(jnp.asarray(rng.randn(14, 8), jnp.float32)))
    g1 = np.abs(rng.randn(20, 20)).astype(np.float32)
    g2 = np.abs(rng.randn(14, 14)).astype(np.float32)
    ours = float(
        shape_to_shape_cycle_loss(
            jnp.asarray(e1), jnp.asarray(g1), jnp.asarray(e2), jnp.asarray(g2), 0.05, 2
        )
    )
    ref = _torch_shape2shape(e1, g1, e2, g2, 0.05, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_pix2shape_matches_reference_formula():
    """With exactly num_pixels fg pixels the sample support is forced, so the
    Gumbel sampler and the reference randperm pick the same set (order
    irrelevant: the loss is a permutation-invariant matrix norm)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    S, D, K, M = 8, 6, 12, 10
    emb = rng.randn(S, S, D).astype(np.float32)
    mask = np.zeros((S, S), bool)
    idx = rng.choice(S * S, M, replace=False)
    mask.flat[idx] = True
    mesh = np.asarray(normalize_embeddings(jnp.asarray(rng.randn(K, D), jnp.float32)))

    ours = float(
        pix_to_shape_cycle_loss(
            jnp.asarray(emb),
            jnp.asarray(mask),
            jnp.asarray(mesh),
            jax.random.PRNGKey(0),
            num_pixels=M,
            temperature_pix_to_vertex=0.05,
            temperature_vertex_to_pix=0.05,
            norm_p=2,
        )
    )

    # torch transcription (cycle_pix2shape.py:122-145) on the full fg set
    rows, cols = np.nonzero(mask)
    coords = np.stack([rows, cols], -1).astype(np.float32)
    pd = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    pe = torch.as_tensor(emb.reshape(-1, D)[mask.reshape(-1)])
    pe = F.normalize(pe, dim=1)
    sim = pe @ torch.as_tensor(mesh).T
    cpv = F.softmax(sim / 0.05, dim=1)
    cvp = F.softmax(sim.T / 0.05, dim=1)
    ref = torch.norm(torch.as_tensor(pd, dtype=torch.float32) * (cpv @ cvp), p=2).item()
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_sample_fg_pixels_support_and_shortfall():
    mask = np.zeros((6, 6), np.float32)
    mask[1, 2] = mask[3, 4] = mask[5, 0] = 1
    idx, valid = sample_fg_pixels(jax.random.PRNGKey(3), jnp.asarray(mask), 5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid.sum() == 3
    assert set(idx[valid]) == {1 * 6 + 2, 3 * 6 + 4, 5 * 6 + 0}


def test_build_cycle_mesh_data_subsample():
    g = np.abs(np.random.RandomState(0).randn(30, 30)).astype(np.float32)
    specs = (("big", "vertex_direct", 30, 0, 4, False, True),)
    (name, idx, geo), = build_cycle_mesh_data(specs, 10, geodists={"big": g})
    assert name == "big" and idx.shape == (10,) and geo.shape == (10, 10)
    ix = np.asarray(idx)
    np.testing.assert_allclose(np.asarray(geo), g[np.ix_(ix, ix)])
    # no subsample when the mesh is small enough
    (name2, idx2, geo2), = build_cycle_mesh_data(specs, 64, geodists={"big": g})
    assert idx2 is None and geo2.shape == (30, 30)


# ------------------------------------------------- e2e multi-mesh training


def _tiny_rcnn_cfg():
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
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
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


@pytest.mark.slow
def test_multimesh_cycle_train_step():
    """Animal-CSE-shaped config: 2 meshes (dict EMBEDDERS layout), mesh-id
    routing, mask-trained coarse segm, and BOTH cycle losses — one full train
    forward produces finite per-mesh embed losses + cycle losses."""
    from detectron2_tpu.config import CfgNode as CN
    from detectron2_tpu.projects.densepose.meshes import MeshCatalog, MeshInfo

    # register two tiny meshes so mesh ids resolve
    for name in ("tmesh_a", "tmesh_b"):
        if name not in MeshCatalog:
            MeshCatalog[name] = MeshInfo(name=name, data=f"/nonexistent/{name}.pkl")

    cfg = _tiny_rcnn_cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME = "DensePoseEmbeddingPredictor"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE = 8
    emb = CN(new_allowed=True)
    emb.update(
        {
            "tmesh_a": CN({"TYPE": "vertex_direct", "NUM_VERTICES": 24}),
            "tmesh_b": CN({"TYPE": "vertex_direct", "NUM_VERTICES": 16}),
        }
    )
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS = emb
    cfg.MODEL.ROI_DENSEPOSE_HEAD.COARSE_SEGM_TRAINED_BY_MASKS = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.PIX_TO_SHAPE_CYCLE_LOSS.ENABLED = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.PIX_TO_SHAPE_CYCLE_LOSS.NUM_PIXELS_TO_SAMPLE = 12
    s2s = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.SHAPE_TO_SHAPE_CYCLE_LOSS
    s2s.ENABLED = True
    s2s.MAX_NUM_VERTICES = 12

    # shape2shape geodists are loaded in from_config via build_cycle_mesh_data;
    # inject them through the head attr instead of staging mesh files: build
    # the model, then clone its roi_heads with test geodists
    from detectron2_tpu.projects.densepose.cse import build_cycle_mesh_data

    rng = np.random.RandomState(0)
    geod = {
        "tmesh_a": np.abs(rng.randn(24, 24)).astype(np.float32),
        "tmesh_b": np.abs(rng.randn(16, 16)).astype(np.float32),
    }
    s2s_enabled_later = True
    s2s.ENABLED = False  # avoid create_mesh file loading inside from_config
    model = build_model(cfg)
    specs = (
        ("tmesh_a", "vertex_direct", 24, 0, 8, False, True),
        ("tmesh_b", "vertex_direct", 16, 0, 8, False, True),
    )
    cyc = build_cycle_mesh_data(specs, 12, geodists=geod)
    model = model.clone(
        roi_heads=model.roi_heads.clone(
            shape2shape_on=s2s_enabled_later, cycle_mesh_data=cyc
        )
    )

    G, P, Ms = 3, 10, 16
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    frac = rng.rand(1, G, P, 2).astype(np.float32)
    pts = boxes[..., None, :2] + frac * (boxes[..., None, 2:] - boxes[..., None, :2])
    vert = rng.randint(0, 16, (1, G, P)).astype(np.int32)
    mesh_id = np.asarray(
        [
            [
                MeshCatalog.get_mesh_id("tmesh_a"),
                MeshCatalog.get_mesh_id("tmesh_b"),
                MeshCatalog.get_mesh_id("tmesh_a"),
            ]
        ],
        np.int64,
    )
    masks = (rng.rand(1, G, Ms, Ms) > 0.3).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(np.zeros((1, G), np.int32)),
        "gt_valid": jnp.ones((1, G), bool),
        "gt_masks": jnp.asarray(masks),
        "gt_dp_points": jnp.asarray(pts),
        "gt_dp_vertex": jnp.asarray(vert),
        "gt_dp_mesh_id": jnp.asarray(mesh_id),
    }
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    losses = model.apply(v, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    for key in (
        "loss_densepose_S",
        "loss_densepose_E_tmesh_a",
        "loss_densepose_E_tmesh_b",
        "loss_shape2shape",
        "loss_pix2shape",
    ):
        assert key in losses, (key, sorted(losses))
        assert np.isfinite(float(losses[key])), (key, losses[key])


def test_animal_config_builds_multimesh_head():
    """The i2m animal config yields a 9-mesh head with pix2shape enabled and
    a catalog-id lookup covering every configured mesh."""
    from detectron2_tpu.projects.densepose.meshes import MeshCatalog

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(
        "configs/DensePose/cse/densepose_rcnn_R_50_FPN_soft_animals_I0_finetune_i2m_16k.yaml"
    )
    model = build_model(cfg)
    rh = model.roi_heads
    assert len(rh.cse_mesh_names) == 9
    assert rh.pix2shape_on and not rh.shape2shape_on
    assert rh.segm_trained_by_masks
    assert rh.embed_loss_name == "SoftEmbeddingLoss"
    lut = rh.cse_mesh_id_lookup
    for li, name in enumerate(rh.cse_mesh_names):
        assert lut[MeshCatalog.get_mesh_id(name)] == li


def test_cse_mapper_and_collator_vertex_targets():
    """A CSE-annotated record flows through DensePoseDatasetMapper +
    DensePoseBatchCollator into gt_dp_vertex / gt_dp_mesh_id batch targets."""
    from detectron2_tpu.projects.densepose.dataset_mapper import (
        DensePoseBatchCollator,
        DensePoseDatasetMapper,
    )
    from detectron2_tpu.projects.densepose.meshes import MeshCatalog, MeshInfo

    if "tmesh_map" not in MeshCatalog:
        MeshCatalog["tmesh_map"] = MeshInfo(name="tmesh_map", data="/nonexistent.pkl")

    H = W = 32
    img = np.zeros((H, W, 3), np.uint8)
    record = {
        "file_name": "synthetic.png",
        "height": H,
        "width": W,
        "image_id": 1,
        "annotations": [
            {
                "bbox": [4, 4, 20, 24],
                "bbox_mode": 1,  # XYWH_ABS
                "category_id": 0,
                "iscrowd": 0,
                "dp_x": [10.0, 100.0, 200.0],
                "dp_y": [20.0, 120.0, 250.0],
                "dp_vertex": [3, 7, 11],
                "ref_model": "tmesh_map",
            }
        ],
    }
    mapper = DensePoseDatasetMapper(
        is_train=True,
        augmentations=[],
        image_format="BGR",
        use_instance_mask=False,
        max_points=8,
    )
    import detectron2_tpu.data.detection_utils as utils

    orig = utils.read_image
    utils.read_image = lambda *a, **k: img
    try:
        out = mapper(record)
    finally:
        utils.read_image = orig
    inst = out["instances"]
    assert hasattr(inst, "gt_dp_vertex") and hasattr(inst, "gt_dp_mesh_id")
    np.testing.assert_array_equal(inst.gt_dp_vertex[0, :3], [3, 7, 11])
    assert inst.gt_dp_mesh_id[0] == MeshCatalog.get_mesh_id("tmesh_map")

    coll = DensePoseBatchCollator(
        size_divisibility=32, pad_value=0.0, max_gt_instances=4
    )
    batch = coll([out])
    assert batch["gt_dp_vertex"].shape[:2] == (1, 4)
    np.testing.assert_array_equal(batch["gt_dp_vertex"][0, 0, :3], [3, 7, 11])
    assert batch["gt_dp_mesh_id"][0, 0] == MeshCatalog.get_mesh_id("tmesh_map")
