import numpy as np

import jax.numpy as jnp

from detectron2_tpu.ops.paste_masks import paste_masks_in_image, paste_masks_probs


def test_full_mask_paste():
    # an all-ones mask pasted into a box covers exactly the box interior
    masks = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 50.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (60, 60)))
    assert out.shape == (1, 60, 60)
    # interior of the box is on
    assert out[0, 25:45, 12:28].all()
    # well outside the box is off
    assert not out[0, :18, :].any()
    assert not out[0, 52:, :].any()
    assert not out[0, :, :8].any()
    assert not out[0, :, 32:].any()


def test_half_mask():
    masks = np.zeros((1, 28, 28), np.float32)
    masks[:, :, 14:] = 1.0  # right half
    boxes = jnp.asarray([[0.0, 0.0, 40.0, 40.0]])
    out = np.asarray(paste_masks_in_image(jnp.asarray(masks), boxes, (40, 40)))
    # right half on, left half off
    assert out[0, 20, 30]
    assert not out[0, 20, 5]


def test_chunking_consistency():
    rng = np.random.RandomState(0)
    masks = jnp.asarray(rng.rand(10, 14, 14).astype(np.float32))
    boxes = jnp.asarray(
        np.column_stack(
            [rng.rand(10) * 20, rng.rand(10) * 20, 20 + rng.rand(10) * 20, 20 + rng.rand(10) * 20]
        ).astype(np.float32)
    )
    a = np.asarray(paste_masks_probs(masks, boxes, (48, 48), chunk=2))
    b = np.asarray(paste_masks_probs(masks, boxes, (48, 48), chunk=8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_empty():
    out = paste_masks_in_image(jnp.zeros((0, 28, 28)), jnp.zeros((0, 4)), (10, 10))
    assert out.shape == (0, 10, 10)


def test_against_grid_sample_reference():
    """Compare with a direct per-pixel bilinear sampling implementation."""
    rng = np.random.RandomState(1)
    M = 8
    mask = rng.rand(M, M).astype(np.float32)
    box = np.array([3.0, 5.0, 23.0, 19.0], np.float32)
    H, W = 30, 30

    expected = np.zeros((H, W), np.float32)
    for yy in range(H):
        for xx in range(W):
            py = (yy + 0.5 - box[1]) / (box[3] - box[1]) * M - 0.5
            px = (xx + 0.5 - box[0]) / (box[2] - box[0]) * M - 0.5
            if py < -1 or py > M or px < -1 or px > M:
                continue
            y0 = int(np.floor(py))
            x0 = int(np.floor(px))
            fy = py - y0
            fx = px - x0

            def get(y, x):
                if 0 <= y < M and 0 <= x < M:
                    return mask[y, x]
                return 0.0

            expected[yy, xx] = (
                get(y0, x0) * (1 - fy) * (1 - fx)
                + get(y0, x0 + 1) * (1 - fy) * fx
                + get(y0 + 1, x0) * fy * (1 - fx)
                + get(y0 + 1, x0 + 1) * fy * fx
            )

    out = np.asarray(paste_masks_probs(jnp.asarray(mask)[None], jnp.asarray(box)[None], (H, W)))[0]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_host_paste_matches_device_paste():
    """The evaluator's numpy paste (postprocessing._paste_masks_np) must agree
    with the on-device separable paste."""
    import numpy as np

    from detectron2_tpu.modeling.postprocessing import _paste_masks_np
    from detectron2_tpu.ops.paste_masks import paste_masks_in_image

    rng = np.random.RandomState(3)
    N, M, H, W = 7, 28, 96, 80
    masks = rng.rand(N, M, M).astype(np.float32)
    xy = rng.rand(N, 2) * 40
    wh = rng.rand(N, 2) * 40 + 5
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)

    host = _paste_masks_np(masks, boxes, H, W)
    dev = np.asarray(paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (H, W)))
    # identical math; allow no disagreement beyond float-assoc at the 0.5 edge
    assert (host != dev).mean() < 1e-4
