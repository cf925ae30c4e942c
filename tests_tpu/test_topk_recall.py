"""TPU-side recall gate for the approx_max_k top-k dispatch (ops/topk.py).

The dense one-stage decode (RetinaNet/FCOS) ranks [B, HWA*C] flattened
scores through lax.approx_max_k on TPU (cfg.TEST.TOPK_RECALL_TARGET). The
parity suites all run on CPU where the path is exact, so without this gate
a recall regression in a future JAX/XLA version would ship silently — the
exact failure mode flagged in the round-3 advisor review.

Run on a real chip: PYTHONPATH=. python -m pytest tests_tpu/ -q
"""

import numpy as np


def test_approx_topk_measured_recall_at_decode_scale():
    from detectron2_tpu.ops.topk import measured_recall

    # one RetinaNet 800x1344 FPN level's flattened (anchor, class) scores
    r = measured_recall(n=2_420_000, k=1000, recall_target=0.99, batch=2)
    # approx_max_k's recall_target is a statistical guarantee on iid inputs;
    # allow a small band below it but fail hard on a real regression
    assert r >= 0.985, f"approx_max_k measured recall {r:.4f} < 0.985"


def test_exact_override_is_exact_on_tpu():
    import jax
    import jax.numpy as jnp

    from detectron2_tpu.ops.topk import top_k_padded

    x = jnp.asarray(np.random.RandomState(0).rand(4, 100_000).astype(np.float32))
    v_exact, i_exact = jax.jit(lambda t: jax.lax.top_k(t, 64))(x)
    v_ours, i_ours = jax.jit(lambda t: top_k_padded(t, 64, exact=True))(x)
    np.testing.assert_array_equal(np.asarray(i_exact), np.asarray(i_ours))
    np.testing.assert_array_equal(np.asarray(v_exact), np.asarray(v_ours))
