import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.modeling.matcher import Matcher
from detectron2_tpu.modeling.sampling import subsample_labels_padded


class TestMatcher:
    def test_basic_thresholds(self):
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=False)
        # 2 gt x 4 predictions
        quality = jnp.asarray(
            [
                [0.9, 0.5, 0.2, 0.0],
                [0.1, 0.6, 0.1, 0.0],
            ]
        )
        matches, labels = matcher(quality)
        np.testing.assert_array_equal(np.asarray(matches), [0, 1, 0, 0])
        np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0, 0])

    def test_low_quality_matches(self):
        matcher = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
        quality = jnp.asarray(
            [
                [0.9, 0.5, 0.2, 0.0],
                [0.1, 0.6, 0.1, 0.0],
            ]
        )
        _, labels = matcher(quality)
        # prediction 1 is gt1's best match -> forced positive
        np.testing.assert_array_equal(np.asarray(labels), [1, 1, 0, 0])

    def test_gt_valid_mask(self):
        matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=False)
        quality = jnp.asarray([[0.9, 0.9], [0.95, 0.1]])
        gt_valid = jnp.asarray([True, False])
        matches, labels = matcher(quality, gt_valid=gt_valid)
        # row 1 is padding: must not win the argmax
        np.testing.assert_array_equal(np.asarray(matches), [0, 0])
        np.testing.assert_array_equal(np.asarray(labels), [1, 1])

    def test_no_valid_gt(self):
        matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
        quality = jnp.asarray([[0.9, 0.9]])
        matches, labels = matcher(quality, gt_valid=jnp.asarray([False]))
        np.testing.assert_array_equal(np.asarray(labels), [0, 0])

    def test_ties_in_low_quality(self):
        matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
        quality = jnp.asarray([[0.3, 0.3, 0.1]])
        _, labels = matcher(quality)
        # both tied best predictions forced positive
        np.testing.assert_array_equal(np.asarray(labels), [1, 1, 0])


class TestSubsample:
    def test_counts(self):
        labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 20)
        idx, valid, is_pos = subsample_labels_padded(
            jax.random.PRNGKey(0), labels, 64, 0.25, bg_label=0
        )
        assert idx.shape == (64,)
        n_pos = int(is_pos.sum())
        n_valid = int(valid.sum())
        # 10 positives available < 16 target -> all 10 taken; rest negatives
        assert n_pos == 10
        assert n_valid == 64
        # all sampled positives actually are positives, negatives negatives
        labels_np = np.asarray(labels)
        sel = labels_np[np.asarray(idx)]
        np.testing.assert_array_equal(sel[np.asarray(is_pos)], 1)
        neg_sel = sel[np.asarray(valid) & ~np.asarray(is_pos)]
        np.testing.assert_array_equal(neg_sel, 0)

    def test_pos_cap(self):
        labels = jnp.asarray([1] * 100 + [0] * 100)
        _, valid, is_pos = subsample_labels_padded(jax.random.PRNGKey(1), labels, 64, 0.25)
        assert int(is_pos.sum()) == 16  # capped at num_samples * fraction
        assert int(valid.sum()) == 64

    def test_insufficient_negatives(self):
        labels = jnp.asarray([1] * 4 + [0] * 5 + [-1] * 100)
        _, valid, is_pos = subsample_labels_padded(jax.random.PRNGKey(2), labels, 64, 0.5)
        assert int(is_pos.sum()) == 4
        assert int(valid.sum()) == 9  # 4 pos + 5 neg, rest invalid

    def test_randomness(self):
        labels = jnp.asarray([0] * 1000)
        idx1, _, _ = subsample_labels_padded(jax.random.PRNGKey(1), labels, 16, 0.5)
        idx2, _, _ = subsample_labels_padded(jax.random.PRNGKey(2), labels, 16, 0.5)
        assert not np.array_equal(np.asarray(idx1), np.asarray(idx2))

    def test_no_duplicates(self):
        labels = jnp.asarray([1] * 30 + [0] * 30)
        idx, valid, _ = subsample_labels_padded(jax.random.PRNGKey(3), labels, 32, 0.5)
        sel = np.asarray(idx)[np.asarray(valid)]
        assert len(set(sel.tolist())) == len(sel)
