"""top_k_padded dispatch semantics (ops/topk.py). The TPU-side measured
recall of the approximate path is gated separately in tests_tpu/ (real
chip); here we pin the CPU behavior (always exact) and the dispatch plumbing
the models rely on (cfg.TEST.EXACT_TOPK / TOPK_RECALL_TARGET end to end)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_cpu_is_exact_lax_topk():
    from detectron2_tpu.ops.topk import top_k_padded

    x = jnp.asarray(np.random.RandomState(0).rand(3, 5000).astype(np.float32))
    v, i = top_k_padded(x, 100)
    v_ref, i_ref = jax.lax.top_k(x, 100)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_exact_flag_and_env_override(monkeypatch):
    """exact=True and D2T_EXACT_TOPK=1 both route to lax.top_k even when the
    backend claims to be TPU; exact=False on 'TPU' routes to approx_max_k."""
    import detectron2_tpu.ops.topk as topk_mod

    calls = []

    def fake_approx(flat, k, recall_target, aggregate_to_topk):
        calls.append(("approx", recall_target))
        return jax.lax.top_k(flat, k)

    monkeypatch.setattr(topk_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(topk_mod.jax.lax, "approx_max_k", fake_approx)

    x = jnp.asarray(np.random.RandomState(1).rand(2, 1000).astype(np.float32))
    topk_mod.top_k_padded(x, 10, recall_target=0.97)  # default: approx on tpu
    assert calls == [("approx", 0.97)]

    calls.clear()
    topk_mod.top_k_padded(x, 10, exact=True)  # cfg EXACT_TOPK
    assert calls == []

    monkeypatch.setenv("D2T_EXACT_TOPK", "1")
    topk_mod.top_k_padded(x, 10)  # env escape hatch
    assert calls == []
    monkeypatch.delenv("D2T_EXACT_TOPK")


def test_cfg_plumbing_reaches_decode():
    """RetinaNet.from_config carries cfg.TEST.{TOPK_RECALL_TARGET,EXACT_TOPK}
    onto the module fields the decode passes to top_k_padded."""
    from detectron2_tpu import model_zoo
    from detectron2_tpu.modeling import build_model

    cfg = model_zoo.get_config("COCO-Detection/retinanet_R_50_FPN_1x.yaml")
    cfg.merge_from_list(["TEST.TOPK_RECALL_TARGET", "0.95", "TEST.EXACT_TOPK", "True"])
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    model = build_model(cfg)
    assert model.topk_recall_target == 0.95
    assert model.exact_topk is True


def test_measured_recall_is_one_on_cpu():
    from detectron2_tpu.ops.topk import measured_recall

    assert measured_recall(n=20_000, k=50, batch=1) == 1.0
