"""DeepLabV3/V3+ project e2e smoke tests."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.config import get_cfg
from detectron2_tpu.modeling import build_model
from detectron2_tpu.projects.deeplab import add_deeplab_config, build_lr_scheduler


def _cfg(head_name):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deeplab_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res5"]
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.SEM_SEG_HEAD.NAME = head_name
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [32]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    if head_name == "DeepLabV3Head":
        cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res5"]
    else:
        cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res5"]
    return cfg


def _run(head_name):
    cfg = _cfg(head_name)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        "image_sizes": jnp.asarray([[64, 64]], jnp.int32),
        "gt_sem_seg": jnp.asarray(rng.randint(0, 7, (1, 64, 64)).astype(np.int32)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    losses = model.apply(variables, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert "loss_sem_seg" in losses and np.isfinite(float(losses["loss_sem_seg"]))

    out = model.apply(
        variables, {"image": batch["image"], "image_sizes": batch["image_sizes"]}, train=False
    )
    assert out["sem_seg"].shape == (1, 64, 64, 7)
    assert np.isfinite(np.asarray(out["sem_seg"])).all()


def test_deeplab_v3():
    _run("DeepLabV3Head")


def test_deeplab_v3_plus():
    _run("DeepLabV3PlusHead")


def test_warmup_poly_lr():
    cfg = _cfg("DeepLabV3Head")
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.BASE_LR = 0.01
    sched = build_lr_scheduler(cfg)
    # warmup ramps up, poly decays to ~0
    assert sched(0) < sched(10) <= 0.01 + 1e-9
    assert sched(50) < sched(10)
    assert sched(99) < sched(50)


def test_hard_pixel_mining_ignores_invalid():
    from detectron2_tpu.projects.deeplab.loss import hard_pixel_mining_ce

    logits = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32))
    targets = np.zeros((1, 8, 8), np.int32)
    targets[0, :4] = 255  # ignored half
    loss = float(hard_pixel_mining_ce(logits, jnp.asarray(targets), top_k_percent=0.25))
    assert np.isfinite(loss) and loss > 0
