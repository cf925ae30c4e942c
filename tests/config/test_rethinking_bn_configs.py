"""Rethinking-BatchNorm project configs (reference
projects/Rethinking-BatchNorm/configs/*): all 6 load; the BN-variant modules
(batch-stat BN, RoI shuffle, shared-training BN head) run on tiny shapes."""

import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.config import LazyConfig


def test_all_six_configs_load():
    files = sorted(glob.glob("configs/Rethinking-BatchNorm/*.py"))
    assert len(files) == 6, files
    for f in files:
        cfg = LazyConfig.load(f)
        assert hasattr(cfg, "model"), f


def test_batch_stat_bn_uses_batch_statistics():
    cfg = LazyConfig.load("configs/Rethinking-BatchNorm/mask_rcnn_BNhead_batch_stats.py")
    norm_cls = cfg.model.roi_heads.box_head.conv_norm
    m = norm_cls(features=8)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 4, 4, 8).astype(np.float32) * 3 + 2)
    params = m.init(jax.random.PRNGKey(0), x)
    # inference output is batch-normalized: ~zero mean, unit variance
    y = np.asarray(m.apply(params, x, train=False))
    assert abs(y.mean()) < 1e-4 and abs(y.std() - 1.0) < 1e-2


def test_shuffled_head_identical_outputs_restored_order():
    """The shuffle wrapper permutes rows only for BN batch composition; with
    a norm-free inner head the output must equal the unshuffled run."""
    from flax import linen as nn

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "rbn_shuffle", "configs/Rethinking-BatchNorm/mask_rcnn_BNhead_shuffle.py"
    )
    # executing the config as a module would trigger its relative imports;
    # instead load via LazyConfig and instantiate the wrapped head
    from detectron2_tpu.config import instantiate

    cfg = LazyConfig.load("configs/Rethinking-BatchNorm/mask_rcnn_BNhead_shuffle.py")
    head = instantiate(cfg.model.roi_heads.box_head)
    # norm-free comparison head sharing the same inner params
    inner = head.inner.clone(conv_norm="")
    plain = head.clone(inner=inner)

    x = jnp.asarray(np.random.RandomState(1).randn(8, 7, 7, 256).astype(np.float32))
    params = plain.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x, train=True
    )
    shuffled = plain.apply(params, x, train=True, rngs={"sampling": jax.random.PRNGKey(5)})
    unshuffled = plain.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(shuffled), np.asarray(unshuffled), atol=1e-5)


@pytest.mark.slow
def test_shared_training_bn_head_runs():
    from detectron2_tpu.config import instantiate

    cfg = LazyConfig.load(
        "configs/Rethinking-BatchNorm/retinanet_SyncBNhead_SharedTraining.py"
    )
    model = instantiate(cfg.model)
    # head BN sees all levels jointly: run the head alone on two tiny levels
    head = model.head
    feats = [
        jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 256).astype(np.float32)),
        jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 256).astype(np.float32)),
    ]
    params = head.init(jax.random.PRNGKey(0), feats, train=True)
    logits, boxes = head.apply(
        params, feats, train=True, mutable=["batch_stats"]
    )[0]
    assert len(logits) == 2 and logits[0].shape[-1] == head.num_anchors * head.num_classes
    assert np.isfinite(np.asarray(logits[0])).all()
