import numpy as np
import jax
import jax.numpy as jnp

from detectron2_tpu.structures import ImageList


def test_padding_and_sizes():
    imgs = [np.ones((10, 15, 3), np.float32), np.full((8, 20, 3), 2.0, np.float32)]
    il = ImageList.from_tensors(imgs, size_divisibility=0)
    assert il.tensor.shape == (2, 10, 20, 3)
    assert il.image_sizes == [(10, 15), (8, 20)]
    # padding area is zero
    assert float(il.tensor[0, :, 15:, :].sum()) == 0.0
    assert float(il.tensor[1, 8:, :, :].sum()) == 0.0
    # original content preserved via __getitem__
    np.testing.assert_allclose(np.asarray(il[1]), np.full((8, 20, 3), 2.0))


def test_size_divisibility():
    imgs = [np.zeros((10, 15, 3), np.float32)]
    il = ImageList.from_tensors(imgs, size_divisibility=32)
    assert il.tensor.shape == (1, 32, 32, 3)


def test_square_constraint():
    imgs = [np.zeros((10, 15, 3), np.float32)]
    il = ImageList.from_tensors(imgs, padding_constraints={"square_size": 64})
    assert il.tensor.shape == (1, 64, 64, 3)


def test_size_bucket():
    imgs = [np.zeros((33, 65, 3), np.float32)]
    il = ImageList.from_tensors(imgs, size_divisibility=0, size_bucket=32)
    assert il.tensor.shape == (1, 64, 96, 3)


def test_pad_value():
    imgs = [np.zeros((4, 4, 1), np.float32), np.zeros((8, 8, 1), np.float32)]
    il = ImageList.from_tensors(imgs, pad_value=7.0)
    assert float(il.tensor[0, 7, 7, 0]) == 7.0


def test_pytree():
    imgs = [np.ones((4, 4, 3), np.float32)]
    il = ImageList.from_tensors(imgs)

    @jax.jit
    def f(x: ImageList):
        return ImageList(x.tensor * 2, x.image_sizes)

    out = f(il)
    assert out.image_sizes == [(4, 4)]
    assert float(out.tensor.max()) == 2.0
