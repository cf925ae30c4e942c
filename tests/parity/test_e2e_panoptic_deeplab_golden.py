"""End-to-end Panoptic-DeepLab parity against the reference
(dev/reference_oracle/make_goldens.py::golden_e2e_panoptic_deeplab,
reference projects/Panoptic-DeepLab/panoptic_deeplab/panoptic_seg.py).

Pins, through our .pkl converter: the semantic head's V3+ decoder + 2-conv
head tower, the instance-embedding branch (its own V3+ decoder, center/offset
towers, predictors, x stride offset scaling), and — on a handcrafted
non-degenerate fixture — the center-NMS + L2 grouping + majority-vote +
stuff-area panoptic fusion (post_processing.py)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from .test_e2e_maskrcnn_golden import synth_weight_value
except ImportError:  # direct-script usage
    from test_e2e_maskrcnn_golden import synth_weight_value

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "e2e_panoptic_deeplab_r50.npz"
)


def _our_cfg():
    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.projects.panoptic_deeplab import add_panoptic_deeplab_config

    cfg = get_cfg()
    add_panoptic_deeplab_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "PanopticDeepLab"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deeplab_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.RESNETS.RES5_MULTI_GRID = [1, 2, 4]
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.MODEL.RESNETS.STEM_TYPE = "deeplab"
    cfg.MODEL.SEM_SEG_HEAD.NAME = "PanopticDeepLabSemSegHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES = ["res2", "res3"]
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [16, 32]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS = [6, 12, 18]
    cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT = 0.0
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 64
    cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 9
    cfg.MODEL.SEM_SEG_HEAD.NORM = "BN"
    cfg.MODEL.INS_EMBED_HEAD.IN_FEATURES = ["res2", "res3", "res5"]
    cfg.MODEL.INS_EMBED_HEAD.PROJECT_FEATURES = ["res2", "res3"]
    cfg.MODEL.INS_EMBED_HEAD.PROJECT_CHANNELS = [16, 32]
    cfg.MODEL.INS_EMBED_HEAD.ASPP_CHANNELS = 64
    cfg.MODEL.INS_EMBED_HEAD.ASPP_DROPOUT = 0.0
    cfg.MODEL.INS_EMBED_HEAD.CONVS_DIM = 32
    cfg.MODEL.INS_EMBED_HEAD.HEAD_CHANNELS = 16
    cfg.MODEL.INS_EMBED_HEAD.NORM = "BN"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_e2e_panoptic_deeplab_reference_weights(tmp_path):
    if not os.path.exists(GOLDEN):
        pytest.skip("panoptic-deeplab e2e golden not generated")
    g = np.load(GOLDEN)

    sd = {}
    for name, shape_s in zip(g["weight_names"], g["weight_shapes"]):
        shape = tuple(int(x) for x in str(shape_s).split(",") if x)
        sd[str(name)] = synth_weight_value(str(name), shape)
    pkl_path = tmp_path / "synthetic_pdl.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "reference-oracle"}, f)

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.modeling import build_model

    cfg = _our_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.asarray(g["image"][None].astype(np.float32)),
        "image_sizes": jnp.asarray([[256, 256]], jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    ckpt = DetectionCheckpointer(variables)
    ckpt.load(str(pkl_path))
    variables = ckpt.params

    out = model.apply(variables, batch, train=False)
    sem = np.asarray(out["sem_seg"][0])  # [H, W, C]
    center = np.asarray(out["center"][0])  # [H, W]
    offset = np.asarray(out["offset"][0])  # [H, W, 2]

    ref_sem = g["sem_seg"].transpose(1, 2, 0)
    assert sem.shape == ref_sem.shape, (sem.shape, ref_sem.shape)
    assert np.abs(sem - ref_sem).max() < 5e-3, np.abs(sem - ref_sem).max()
    ref_center = g["center"][0] if g["center"].ndim == 3 else g["center"]
    assert np.abs(center - ref_center).max() < 5e-3, np.abs(center - ref_center).max()
    ref_offset = g["offset"].transpose(1, 2, 0)
    assert np.abs(offset - ref_offset).max() < 2e-2, np.abs(offset - ref_offset).max()


def test_panoptic_fusion_matches_reference():
    """Grouping fusion on the golden's handcrafted fixture: same partition as
    the reference's get_panoptic_segmentation (instance ids may permute
    within a class — the reference numbers by raw-center order, we by center
    score order)."""
    if not os.path.exists(GOLDEN):
        pytest.skip("panoptic-deeplab e2e golden not generated")
    g = np.load(GOLDEN)

    from detectron2_tpu.projects.panoptic_deeplab import get_panoptic_segmentation

    pan, _ = get_panoptic_segmentation(
        jnp.asarray(g["syn_sem"].astype(np.int32)),
        jnp.asarray(g["syn_center"]),
        jnp.asarray(g["syn_offset"].transpose(1, 2, 0)),
        thing_ids=[5, 6, 7, 8],
        label_divisor=1000,
        stuff_area=64,
        threshold=0.1,
        nms_kernel=7,
        top_k=200,
    )
    pan = np.asarray(pan)
    ref = g["syn_panoptic"]
    assert pan.shape == ref.shape

    # void + stuff ids must match exactly; thing segments must match as sets
    # of pixel masks per class
    ref_things = {}
    our_things = {}
    for arr, store in ((ref, ref_things), (pan, our_things)):
        for pid in np.unique(arr):
            if pid < 0:
                continue
            cls, inst = pid // 1000, pid % 1000
            if inst > 0:
                store.setdefault(cls, []).append(
                    frozenset(np.flatnonzero(arr.reshape(-1) == pid).tolist())
                )
            else:
                # stuff ids identical
                np.testing.assert_array_equal(pan == pid, ref == pid)
    np.testing.assert_array_equal(pan < 0, ref < 0)
    assert set(ref_things) == set(our_things)
    for cls in ref_things:
        assert set(ref_things[cls]) == set(our_things[cls]), cls
