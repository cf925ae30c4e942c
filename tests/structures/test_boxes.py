import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.structures import Boxes, BoxMode, pairwise_iou, pairwise_ioa, matched_pairwise_iou


def random_boxes(n, max_coord=100, rng=None):
    rng = rng or np.random.RandomState(0)
    xy = rng.rand(n, 2) * max_coord * 0.5
    wh = rng.rand(n, 2) * max_coord * 0.5 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxMode:
    def test_box_convert_list(self):
        box = [5.0, 5.0, 10.0, 10.0]
        output = BoxMode.convert(box, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        assert output == [5.0, 5.0, 5.0, 5.0]
        back = BoxMode.convert(output, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
        assert back == box

    def test_box_convert_array(self):
        box = np.asarray([[5, 5, 10, 10], [1, 1, 2, 3]], dtype=np.float32)
        out = BoxMode.convert(box, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        expected = np.asarray([[5, 5, 5, 5], [1, 1, 1, 2]], dtype=np.float32)
        np.testing.assert_allclose(out, expected)

    def test_xywha_to_xyxy(self):
        # axis-aligned rotated box
        box = [10.0, 10.0, 4.0, 6.0, 0.0]
        out = BoxMode.convert(box, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
        np.testing.assert_allclose(out, [8, 7, 12, 13])

        # 90 degrees: w and h swap
        box = [10.0, 10.0, 4.0, 6.0, 90.0]
        out = BoxMode.convert(box, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
        np.testing.assert_allclose(out, [7, 8, 13, 12], atol=1e-5)

    def test_xywh_to_xywha(self):
        box = [5.0, 5.0, 10.0, 10.0]
        out = BoxMode.convert(box, BoxMode.XYWH_ABS, BoxMode.XYWHA_ABS)
        np.testing.assert_allclose(out, [10, 10, 10, 10, 0])


class TestBoxes:
    def test_area_clip_nonempty(self):
        b = Boxes(jnp.asarray([[0, 0, 10, 10], [-5, -5, 5, 5], [3, 3, 3, 8]], dtype=jnp.float32))
        np.testing.assert_allclose(b.area(), [100, 100, 0])
        b.clip((8, 8))
        np.testing.assert_allclose(np.asarray(b.tensor), [[0, 0, 8, 8], [0, 0, 5, 5], [3, 3, 3, 8]])
        np.testing.assert_array_equal(np.asarray(b.nonempty()), [True, True, False])

    def test_inside_box(self):
        b = Boxes(jnp.asarray([[0, 0, 10, 10], [-1, 0, 10, 10]], dtype=jnp.float32))
        np.testing.assert_array_equal(np.asarray(b.inside_box((20, 20))), [True, False])

    def test_cat_getitem_len(self):
        b1 = Boxes(jnp.asarray(random_boxes(3)))
        b2 = Boxes(jnp.asarray(random_boxes(2)))
        cat = Boxes.cat([b1, b2])
        assert len(cat) == 5
        sub = cat[np.array([0, 4])]
        assert len(sub) == 2

    def test_pytree(self):
        b = Boxes(jnp.asarray(random_boxes(4)))

        @jax.jit
        def f(boxes: Boxes):
            return boxes.area()

        np.testing.assert_allclose(f(b), b.area(), rtol=1e-6)

    def test_scale(self):
        b = Boxes(jnp.asarray([[1.0, 2.0, 3.0, 4.0]]))
        b.scale(2.0, 3.0)
        np.testing.assert_allclose(np.asarray(b.tensor), [[2, 6, 6, 12]])


class TestIoU:
    def test_pairwise_iou_exact(self):
        boxes1 = Boxes(jnp.asarray([[0.0, 0.0, 10.0, 10.0]]))
        boxes2 = Boxes(
            jnp.asarray(
                [
                    [0.0, 0.0, 10.0, 10.0],
                    [5.0, 5.0, 15.0, 15.0],
                    [20.0, 20.0, 30.0, 30.0],
                ]
            )
        )
        iou = pairwise_iou(boxes1, boxes2)
        np.testing.assert_allclose(np.asarray(iou), [[1.0, 25.0 / 175.0, 0.0]], rtol=1e-6)

    def test_pairwise_iou_vs_naive(self):
        rng = np.random.RandomState(42)
        b1 = random_boxes(20, rng=rng)
        b2 = random_boxes(30, rng=rng)
        iou = np.asarray(pairwise_iou(Boxes(jnp.asarray(b1)), Boxes(jnp.asarray(b2))))

        for i in range(20):
            for j in range(0, 30, 7):
                xx1 = max(b1[i, 0], b2[j, 0])
                yy1 = max(b1[i, 1], b2[j, 1])
                xx2 = min(b1[i, 2], b2[j, 2])
                yy2 = min(b1[i, 3], b2[j, 3])
                inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
                a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
                expected = inter / (a1 + a2 - inter)
                assert abs(iou[i, j] - expected) < 1e-5

    def test_matched_iou(self):
        b = random_boxes(10)
        out = np.asarray(matched_pairwise_iou(Boxes(jnp.asarray(b)), Boxes(jnp.asarray(b))))
        np.testing.assert_allclose(out, np.ones(10), rtol=1e-6)

    def test_ioa(self):
        b1 = Boxes(jnp.asarray([[0.0, 0.0, 10.0, 10.0]]))
        b2 = Boxes(jnp.asarray([[5.0, 5.0, 15.0, 15.0]]))
        ioa = np.asarray(pairwise_ioa(b1, b2))
        np.testing.assert_allclose(ioa, [[0.25]], rtol=1e-6)
