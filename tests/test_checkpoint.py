"""Checkpointer + d2 .pkl converter tests.

Covers the reference's test_checkpoint.py territory plus the failure mode
where a TrainState-holding checkpointer silently matched 0 tensors: the
converter must strip flax collection roots and handle GetAttrKey path entries
(jax key paths of dataclass pytrees), and loading must fail loudly when
nothing matches.
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _synthetic_variables():
    """A tiny flax-style variables dict shaped like a backbone fragment."""
    return {
        "params": {
            "backbone": {
                "stem": {"conv1": {"kernel": jnp.zeros((7, 7, 3, 8))}},
                "res2_0": {"conv1": {"kernel": jnp.zeros((1, 1, 8, 8)), "bias": jnp.zeros((8,))}},
            },
            "roi_heads": {"box_predictor": {"cls_score": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))}}},
        }
    }


def _synthetic_d2_state_dict():
    """The same tensors in torch layouts under d2 names."""
    rng = np.random.RandomState(0)
    return {
        "backbone.stem.conv1.weight": rng.randn(8, 3, 7, 7).astype(np.float32),
        "backbone.res2.0.conv1.weight": rng.randn(8, 8, 1, 1).astype(np.float32),
        "backbone.res2.0.conv1.bias": rng.randn(8).astype(np.float32),
        "roi_heads.box_predictor.cls_score.weight": rng.randn(4, 8).astype(np.float32),
        "roi_heads.box_predictor.cls_score.bias": rng.randn(4).astype(np.float32),
    }


def test_convert_plain_variables():
    from detectron2_tpu.checkpoint.d2_converter import convert_d2_state_dict

    variables = _synthetic_variables()
    sd = _synthetic_d2_state_dict()
    new_vars, report = convert_d2_state_dict(sd, variables)
    assert report.startswith("Loaded 5/5"), report
    got = np.asarray(new_vars["params"]["backbone"]["stem"]["conv1"]["kernel"])
    want = sd["backbone.stem.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    got_fc = np.asarray(new_vars["params"]["roi_heads"]["box_predictor"]["cls_score"]["kernel"])
    np.testing.assert_array_equal(got_fc, sd["roi_heads.box_predictor.cls_score.weight"].T)


def test_load_pkl_into_train_state(tmp_path):
    """Regression: DefaultTrainer holds a TrainState; .pkl loading must convert
    into state.params (not feed step/opt_state through the name mapper) and
    actually match tensors."""
    import optax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.parallel import TrainState

    variables = _synthetic_variables()
    state = TrainState.create(variables, optax.sgd(0.1))

    sd = _synthetic_d2_state_dict()
    pkl = os.path.join(tmp_path, "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    cp = DetectionCheckpointer(state, str(tmp_path))
    cp.resume_or_load(pkl, resume=False)
    new_state = cp.params
    assert isinstance(new_state, TrainState)
    got = np.asarray(new_state.params["params"]["backbone"]["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, sd["backbone.stem.conv1.weight"].transpose(2, 3, 1, 0))
    # step / opt_state untouched
    assert int(new_state.step) == 0


def test_load_pkl_zero_match_raises(tmp_path):
    import optax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.parallel import TrainState

    state = TrainState.create(_synthetic_variables(), optax.sgd(0.1))
    pkl = os.path.join(tmp_path, "bogus.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"model": {"totally.unrelated.weight": np.zeros((3, 3), np.float32)}}, f)

    cp = DetectionCheckpointer(state, str(tmp_path))
    with pytest.raises(RuntimeError, match="matched 0"):
        cp.load(pkl)


def test_native_save_resume_roundtrip(tmp_path):
    import optax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.parallel import TrainState

    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.random.RandomState(1).randn(*x.shape), x.dtype),
        _synthetic_variables(),
    )
    state = TrainState.create(variables, optax.sgd(0.1))
    cp = DetectionCheckpointer(state, str(tmp_path))
    cp.save("model_0000000", iteration=0)
    assert cp.has_checkpoint()

    state2 = TrainState.create(_synthetic_variables(), optax.sgd(0.1))
    cp2 = DetectionCheckpointer(state2, str(tmp_path))
    extra = cp2.resume_or_load("", resume=True)
    assert extra.get("iteration") == 0
    got = np.asarray(cp2.params.params["params"]["backbone"]["stem"]["conv1"]["kernel"])
    want = np.asarray(variables["params"]["backbone"]["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, want)


def test_model_catalog_urls():
    """catalog:// scheme (reference checkpoint/catalog.py): names resolve to
    the public bucket URLs; unknown names raise."""
    import pytest

    from detectron2_tpu.checkpoint.catalog import ModelCatalog, resolve_catalog_url

    url = resolve_catalog_url("catalog://ImageNetPretrained/MSRA/R-50")
    assert url == "https://dl.fbaipublicfiles.com/detectron/ImageNetPretrained/MSRA/R-50.pkl"

    url = resolve_catalog_url("catalog://Caffe2Detectron/COCO/35858933/e2e_mask_rcnn_R-50-FPN_1x")
    assert url.startswith("https://dl.fbaipublicfiles.com/detectron/35858933/")
    assert url.endswith("model_final.pkl")
    assert "generalized_rcnn" in url

    rpn_url = resolve_catalog_url("catalog://Caffe2Detectron/COCO/35998355/rpn_R-50-C4_1x")
    assert "/rpn/" in rpn_url

    assert resolve_catalog_url("/local/path.pkl") == "/local/path.pkl"
    with pytest.raises(RuntimeError):
        ModelCatalog.get("nonexistent/name")


def test_convtranspose_layout():
    """torch ConvTranspose2d kernels must be converted IOHW->HWIO PLUS a
    spatial flip: flax's ConvTranspose applies the kernel unflipped relative
    to torch (bit-exact check backing d2_converter._to_flax_layout)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from detectron2_tpu.layers.wrappers import ConvTranspose2d

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 5, 3).astype(np.float32)
    W = rng.randn(3, 2, 2, 2).astype(np.float32)  # torch IOHW
    b = rng.randn(2).astype(np.float32)

    tt = torch.nn.ConvTranspose2d(3, 2, 2, stride=2)
    tt.weight.data = torch.from_numpy(W)
    tt.bias.data = torch.from_numpy(b)
    ref = tt(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)

    from detectron2_tpu.checkpoint.d2_converter import _to_flax_layout

    mod = ConvTranspose2d(features=2, kernel_size=2, strides=2)
    k = _to_flax_layout(W, (2, 2, 3, 2), conv_transpose=True)
    v = {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}}
    out = np.asarray(mod.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
