"""DensePose config zoo + confidence/soft-loss variants (reference
projects/DensePose/configs/*): every yaml merges; the segm-confidence
predictor and soft embedding loss run on tiny shapes."""

import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.projects.densepose import add_densepose_config


ALL_YAMLS = sorted(
    glob.glob("configs/DensePose/**/*.yaml", recursive=True)
)


def test_inventory():
    # 26 chart/HRNet + 19 cse (10 human + 8 animal + chimps)
    # + 9 quick_schedules (8 + 1 cse) + 2 evolution
    assert len(ALL_YAMLS) == 56, (len(ALL_YAMLS), ALL_YAMLS)


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: p.split("DensePose/")[-1])
def test_config_merges(path):
    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(path)
    assert cfg.MODEL.DENSEPOSE_ON


def test_wc_variants_flags():
    for tag, uv, segm in [
        ("WC1", "iid_iso", False),
        ("WC2", "indep_aniso", False),
        ("WC1M", "iid_iso", True),
        ("WC2M", "indep_aniso", True),
    ]:
        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.merge_from_file(f"configs/DensePose/densepose_rcnn_R_50_FPN_{tag}_s1x.yaml")
        h = cfg.MODEL.ROI_DENSEPOSE_HEAD
        assert h.UV_CONFIDENCE.ENABLED and h.UV_CONFIDENCE.TYPE == uv
        assert h.SEGM_CONFIDENCE.ENABLED == segm


def test_segm_confidence_predictor_outputs():
    """The *M predictor emits softplus+eps confidences and scales the
    segmentation logits by them (reference chart_confidence.py:125-148)."""
    from detectron2_tpu.projects.densepose.densepose_head import DensePoseChartPredictor

    plain = DensePoseChartPredictor(num_patches=4)
    conf = DensePoseChartPredictor(num_patches=4, segm_confidence=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 7, 16).astype(np.float32))
    vp = plain.init(jax.random.PRNGKey(0), x)
    vc = conf.init(jax.random.PRNGKey(0), x)
    # shared layers initialized identically: graft plain's params into conf's
    merged = jax.tree_util.tree_map(lambda a: a, vc)
    for k, v in vp["params"].items():
        merged["params"][k] = v
    out = conf.apply(merged, x)
    base = plain.apply(vp, x)
    eps = conf.segm_confidence_epsilon
    assert (np.asarray(out["fine_segm_confidence"]) >= eps).all()
    assert (np.asarray(out["coarse_segm_confidence"]) >= eps).all()
    np.testing.assert_allclose(
        np.asarray(out["fine_segm"]),
        np.asarray(base["fine_segm"] * out["fine_segm_confidence"]),
        rtol=1e-5,
        atol=1e-5,
    )


def test_soft_embedding_loss():
    """Soft targets: loss is minimized by embeddings matching the geodesic
    neighborhood, not only the exact GT vertex; degenerates to the hard loss
    when geodesics are 'infinitely peaked'."""
    from detectron2_tpu.projects.densepose.cse import (
        cse_embedding_loss,
        cse_soft_embedding_loss,
    )

    K, D, P = 6, 4, 3
    rng = np.random.RandomState(0)
    mesh = jnp.asarray(rng.randn(K, D).astype(np.float32))
    pix = jnp.asarray(rng.randn(P, D).astype(np.float32))
    ids = jnp.asarray([0, 2, 5])
    valid = jnp.ones((P,), bool)
    # geodesics: zero to self, large to everyone else -> soft == hard
    geod = jnp.where(jnp.eye(K, dtype=bool), 0.0, 1e6)
    hard = cse_embedding_loss(pix, ids, valid, mesh, 0.01)
    soft = cse_soft_embedding_loss(pix, ids, valid, mesh, geod, 0.01, 0.01)
    np.testing.assert_allclose(float(hard), float(soft), rtol=1e-5)
    # a genuinely soft geodesic spreads the target: loss differs from hard
    geod2 = jnp.abs(jnp.arange(K)[:, None] - jnp.arange(K)[None, :]).astype(jnp.float32) * 0.05
    soft2 = cse_soft_embedding_loss(pix, ids, valid, mesh, geod2, 0.01, 0.01)
    assert abs(float(soft2) - float(hard)) > 1e-4
    # masked points do not contribute
    none = cse_soft_embedding_loss(pix, ids, jnp.zeros((P,), bool), mesh, geod2, 0.01, 0.01)
    assert float(none) == 0.0


def test_cse_datasets_registered():
    from detectron2_tpu.data import DatasetCatalog
    from detectron2_tpu.projects.densepose import register_densepose_coco

    register_densepose_coco()
    for name in (
        "densepose_coco_2014_train_cse",
        "densepose_coco_2014_minival_cse",
        "densepose_coco_2014_minival_100_cse",
    ):
        assert name in DatasetCatalog
