"""Federated-loss class sampling + sigmoid CE (reference fast_rcnn.py:356-422,
the LVIS recipe)."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tpu.modeling.roi_heads.fast_rcnn import (
    FastRCNNOutputLayers,
    fed_loss_class_mask,
)


def test_fed_mask_keeps_appeared_and_fills_to_quota():
    C, F = 40, 10
    gt = jnp.asarray([0, 3, 3, 7, C, C, -1, -1])  # appeared fg {0,3,7} + bg
    valid = gt >= 0
    w = jnp.ones((C,), jnp.float32)
    for seed in range(5):
        mask = fed_loss_class_mask(jax.random.PRNGKey(seed), gt, valid, C, F, w)
        m = np.asarray(mask)
        assert m[0] and m[3] and m[7]
        # appeared = {0,3,7,bg} -> 4; negatives fill to F total
        assert m.sum() == F - 1  # bg counted in the quota but not in the [C] mask


def test_fed_mask_zero_weight_never_sampled():
    C, F = 30, 12
    gt = jnp.asarray([1, C])
    valid = jnp.ones((2,), bool)
    w = jnp.ones((C,), jnp.float32).at[5].set(0.0).at[20].set(0.0)
    for seed in range(10):
        mask = np.asarray(
            fed_loss_class_mask(jax.random.PRNGKey(seed), gt, valid, C, F, w)
        )
        assert not mask[5] and not mask[20]
        assert mask[1]


def test_fed_mask_more_appeared_than_quota_keeps_all():
    C, F = 20, 4
    gt = jnp.asarray([0, 1, 2, 3, 4, 5, C])
    valid = jnp.ones((7,), bool)
    mask = np.asarray(
        fed_loss_class_mask(jax.random.PRNGKey(0), gt, valid, C, F, jnp.ones((C,)))
    )
    # all appeared fg classes kept, no negatives added (quota already exceeded)
    assert mask[:6].all() and mask.sum() == 6


def test_fed_mask_padding_slots_ignored():
    C, F = 16, 6
    gt = jnp.asarray([2, -1, -1, -1])
    valid = gt >= 0
    masks = [
        np.asarray(
            fed_loss_class_mask(jax.random.PRNGKey(s), gt, valid, C, F, jnp.ones((C,)))
        )
        for s in range(8)
    ]
    for m in masks:
        assert m[2]
        # appeared = {2} only (padding never counts, bg absent) -> F-1 negatives
        assert m.sum() == F
    # sampling actually varies with the key
    assert len({tuple(m.tolist()) for m in masks}) > 1


def test_fed_loss_bounded_by_unfed_and_deterministic_per_key():
    """losses() with use_fed_loss is the unfed sigmoid CE restricted to the
    sampled class mask: strictly positive, at most the unfed value, and a
    function of the sampling key only."""
    C, R = 12, 6
    fed = FastRCNNOutputLayers(
        num_classes=C,
        use_sigmoid_ce=True,
        use_fed_loss=True,
        fed_loss_num_classes=5,
        fed_loss_cls_weights=tuple(np.ones(C)),
        cls_agnostic_bbox_reg=True,
    )
    unfed = FastRCNNOutputLayers(
        num_classes=C, use_sigmoid_ce=True, cls_agnostic_bbox_reg=True
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, 16).astype(np.float32))
    gt_classes = jnp.asarray([0, 2, C, C, -1, -1])
    proposal_boxes = jnp.asarray(rng.rand(R, 4).astype(np.float32) * 50)
    gt_boxes = proposal_boxes + 1.0

    variables = fed.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def loss_fn(mod):
        return mod.losses(mod(x, train=True), proposal_boxes, gt_boxes, gt_classes)

    def run(layer, key):
        return layer.apply(variables, method=loss_fn, rngs={"sampling": key})

    fed_a = float(run(fed, jax.random.PRNGKey(3))["loss_cls"])
    fed_a2 = float(run(fed, jax.random.PRNGKey(3))["loss_cls"])
    fed_b = float(run(fed, jax.random.PRNGKey(4))["loss_cls"])
    unfed_v = float(run(unfed, jax.random.PRNGKey(3))["loss_cls"])

    assert np.isfinite(fed_a) and fed_a > 0
    assert fed_a == fed_a2  # deterministic given the key
    assert fed_a <= unfed_v + 1e-6  # masking can only remove CE terms
    assert fed_a != fed_b or fed_a == unfed_v  # key changes the sampled mask
    # box loss unaffected by fed masking
    np.testing.assert_allclose(
        float(run(fed, jax.random.PRNGKey(3))["loss_box_reg"]),
        float(run(unfed, jax.random.PRNGKey(5))["loss_box_reg"]),
        rtol=1e-6,
    )
