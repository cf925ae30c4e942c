import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.ops.nms import batched_nms_padded, nms, nms_padded


def naive_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS reference (numpy)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    suppressed = np.zeros(len(boxes), dtype=bool)
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order[_i + 1 :]:
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a1 + a2 - inter) if a1 + a2 - inter > 0 else 0.0
            if iou > thresh:
                suppressed[j] = True
    return keep


def random_boxes_scores(n, seed, max_coord=80):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * max_coord * 0.6
    wh = rng.rand(n, 2) * max_coord * 0.4 + 1
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,seed,tile", [(50, 0, 16), (200, 1, 64), (333, 2, 128), (1000, 3, 512)])
def test_nms_padded_matches_greedy(n, seed, tile):
    boxes, scores = random_boxes_scores(n, seed)
    expected = naive_greedy_nms(boxes, scores, 0.5)
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, tile=tile))
    np.testing.assert_array_equal(keep, expected)


def test_nms_with_padding_rows():
    boxes, scores = random_boxes_scores(60, 7)
    valid = np.ones(80, dtype=bool)
    valid[60:] = False
    boxes_p = np.concatenate([boxes, np.zeros((20, 4), np.float32)])
    scores_p = np.concatenate([scores, np.zeros(20, np.float32)])
    keep = np.asarray(
        nms_padded(jnp.asarray(boxes_p), jnp.asarray(scores_p), 0.5, valid=jnp.asarray(valid), tile=32)
    )
    expected = naive_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep[:60], expected)
    assert not keep[60:].any()


def test_nms_jit():
    boxes, scores = random_boxes_scores(128, 11)
    f = jax.jit(lambda b, s: nms_padded(b, s, 0.5, tile=64))
    keep = np.asarray(f(jnp.asarray(boxes), jnp.asarray(scores)))
    expected = naive_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, expected)


def test_batched_nms_classes_dont_interact():
    # two identical boxes in different classes must both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    keep = np.asarray(batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5))
    assert keep.all()

    # same class: lower one suppressed
    idxs = np.array([0, 0], np.int32)
    keep = np.asarray(batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5))
    np.testing.assert_array_equal(keep, [True, False])


def test_batched_nms_vs_per_class_greedy():
    boxes, scores = random_boxes_scores(150, 5)
    idxs = np.random.RandomState(5).randint(0, 4, 150)
    keep = np.asarray(
        batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.45, tile=64)
    )
    expected = np.zeros(150, dtype=bool)
    for c in range(4):
        sel = idxs == c
        expected[sel] = naive_greedy_nms(boxes[sel], scores[sel], 0.45)
    np.testing.assert_array_equal(keep, expected)


def test_host_nms_api():
    boxes, scores = random_boxes_scores(40, 9)
    idx = np.asarray(nms(boxes, scores, 0.5))
    expected = naive_greedy_nms(boxes, scores, 0.5)
    assert set(idx.tolist()) == set(np.nonzero(expected)[0].tolist())
    # sorted by decreasing score
    assert all(scores[idx[i]] >= scores[idx[i + 1]] for i in range(len(idx) - 1))
