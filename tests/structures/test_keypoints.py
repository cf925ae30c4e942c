"""Keypoint structure tests (reference tests/structures/test_keypoints.py plus
encode/decode semantics of structures/keypoints.py:105-222)."""

import numpy as np
import jax.numpy as jnp

from detectron2_tpu.structures import Boxes, Keypoints
from detectron2_tpu.structures.keypoints import heatmaps_to_keypoints


def test_cat_and_getitem():
    k1 = Keypoints(np.random.rand(4, 17, 3).astype(np.float32))
    k2 = Keypoints(np.random.rand(6, 17, 3).astype(np.float32))
    cat = Keypoints.cat([k1, k2])
    assert len(cat) == 10
    np.testing.assert_allclose(np.asarray(cat[4:].tensor), np.asarray(k2.tensor))
    assert cat[0].tensor.shape == (1, 17, 3)


def test_to_heatmap_bin_arithmetic():
    S = 8
    boxes = Boxes(np.array([[0.0, 0.0, 16.0, 16.0]], np.float32))
    kpts = Keypoints(
        np.array(
            [
                [
                    [0.0, 0.0, 2.0],  # top-left corner -> bin (0, 0)
                    [15.9, 15.9, 2.0],  # just inside -> bin (7, 7)
                    [16.0, 16.0, 2.0],  # exactly the box max -> clamped to (7,7)
                    [8.0, 4.0, 2.0],  # -> bin (x=4, y=2)
                    [20.0, 8.0, 2.0],  # outside the box -> invalid
                    [8.0, 8.0, 0.0],  # unlabeled -> invalid
                ]
            ],
            np.float32,
        )
    )
    heat, valid = kpts.to_heatmap(boxes, S)
    heat, valid = np.asarray(heat), np.asarray(valid)
    assert valid.tolist() == [[True, True, True, True, False, False]]
    assert heat[0, 0] == 0
    assert heat[0, 1] == 7 * S + 7
    assert heat[0, 2] == 7 * S + 7
    assert heat[0, 3] == 2 * S + 4


def test_heatmap_decode_roundtrip():
    """A keypoint encoded into a one-hot heatmap decodes back near itself."""
    S = 14
    rois = np.array([[10.0, 20.0, 66.0, 90.0]], np.float32)  # 56 x 70 box
    gt = np.array([[[38.0, 55.0, 2.0], [12.0, 24.0, 2.0]]], np.float32)
    heat_idx, valid = Keypoints(gt).to_heatmap(Boxes(rois), S)
    assert bool(np.all(np.asarray(valid)))

    maps = np.full((1, 2, S, S), -10.0, np.float32)
    for k in range(2):
        idx = int(np.asarray(heat_idx)[0, k])
        maps[0, k, idx // S, idx % S] = 10.0
    dec = np.asarray(heatmaps_to_keypoints(jnp.asarray(maps), jnp.asarray(rois)))
    assert dec.shape == (1, 2, 4)
    # decoded position within one heatmap bin of the ground truth
    bin_w, bin_h = 56.0 / S, 70.0 / S
    for k in range(2):
        assert abs(dec[0, k, 0] - gt[0, k, 0]) <= bin_w, (k, dec[0, k])
        assert abs(dec[0, k, 1] - gt[0, k, 1]) <= bin_h, (k, dec[0, k])
        # the static-upsample decode interpolates the spike, so the argmax
        # logit is attenuated but must stay clearly positive (peak found)
        assert dec[0, k, 2] > 0.0
        assert 0.0 < dec[0, k, 3] <= 1.0


def test_heatmap_decode_inside_roi():
    """Decoded coordinates always land inside the (clipped) roi."""
    rng = np.random.RandomState(7)
    maps = rng.standard_normal((5, 3, 14, 14)).astype(np.float32)
    rois = np.abs(rng.standard_normal((5, 4))).astype(np.float32) * 50
    rois[:, 2:] = rois[:, :2] + np.abs(rois[:, 2:]) + 5
    dec = np.asarray(heatmaps_to_keypoints(jnp.asarray(maps), jnp.asarray(rois)))
    assert np.all(dec[..., 0] >= rois[:, None, 0])
    assert np.all(dec[..., 0] <= rois[:, None, 2])
    assert np.all(dec[..., 1] >= rois[:, None, 1])
    assert np.all(dec[..., 1] <= rois[:, None, 3])
