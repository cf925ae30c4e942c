"""The full ViTDet config zoo (COCO + LVIS) loads, carries the reference's
hyperparameters, and a shrunken cascade variant builds + runs
(reference projects/ViTDet/configs/{COCO,LVIS}/*.py)."""

import glob

import numpy as np
import pytest

from detectron2_tpu.config import LazyConfig

ALL_VITDET = sorted(glob.glob("configs/ViTDet/*.py") + glob.glob("configs/ViTDet/LVIS/*.py"))


def test_inventory_matches_reference():
    # 11 COCO + 11 LVIS recipes, like reference projects/ViTDet/configs
    assert len(ALL_VITDET) == 22, ALL_VITDET


@pytest.mark.parametrize("path", ALL_VITDET, ids=lambda p: p.split("configs/ViTDet/")[-1])
def test_config_loads(path):
    cfg = LazyConfig.load(path)
    for key in ("model", "train", "optimizer", "lr_multiplier", "dataloader"):
        assert hasattr(cfg, key), f"{path} missing {key}"
    if "/LVIS/" in path:
        preds = cfg.model.roi_heads.box_predictor
        preds = preds if isinstance(preds, list) else [preds]
        for p in preds:
            assert p.num_classes == 1203
            assert p.use_fed_loss and p.use_sigmoid_ce
            assert p.test_topk_per_image == 300 and p.test_score_thresh == 0.02
        assert cfg.model.roi_heads.num_classes == 1203


def test_variant_hparams():
    l = LazyConfig.load("configs/ViTDet/cascade_mask_rcnn_vitdet_l_100ep.py")
    assert l.model.backbone.net.embed_dim == 1024 and l.model.backbone.net.depth == 24
    assert l.model.backbone.net.drop_path_rate == 0.4
    assert 5 not in l.model.backbone.net.window_block_indexes
    h = LazyConfig.load("configs/ViTDet/mask_rcnn_vitdet_h_75ep.py")
    assert h.model.backbone.net.embed_dim == 1280 and h.model.backbone.net.depth == 32
    assert h.train["max_iter"] == 184375 * 3 // 4
    assert h.lr_multiplier.multiplier.scheduler.milestones == [163889 * 3 // 4, 177546 * 3 // 4]
    swin = LazyConfig.load("configs/ViTDet/cascade_mask_rcnn_swin_l_in21k_50ep.py")
    assert swin.model.backbone.bottom_up.embed_dim == 192
    mvit_h = LazyConfig.load("configs/ViTDet/cascade_mask_rcnn_mvitv2_h_in21k_36ep.py")
    assert mvit_h.model.backbone.bottom_up.depths == (4, 8, 60, 8)
    assert mvit_h.train["max_iter"] == 67500


@pytest.mark.slow
def test_shrunken_cascade_mvit_builds_and_runs():
    """Instantiate the ViTDet cascade MViTv2 model at toy size and run one
    inference batch — drives FPN-over-MViT + LN heads + 3-stage cascade."""
    import jax
    import jax.numpy as jnp

    from detectron2_tpu.config import instantiate

    cfg = LazyConfig.load("configs/ViTDet/cascade_mask_rcnn_mvitv2_b_in21k_100ep.py")
    net = cfg.model.backbone.bottom_up
    net.embed_dim = 32
    net.depths = (1, 1, 1, 1)
    net.num_heads = (1, 2, 4, 8)
    net.img_size = 128
    model = instantiate(cfg.model)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[128, 128]], jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    out = model.apply(params, batch, train=False)
    assert out["pred_boxes"].shape[-1] == 4
    assert np.isfinite(np.asarray(out["scores"])).all()
