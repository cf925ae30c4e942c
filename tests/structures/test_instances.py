import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tpu.structures import Boxes, Instances


def make_instances(n=5):
    inst = Instances((100, 200))
    inst.proposal_boxes = Boxes(jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4))
    inst.scores = jnp.arange(n, dtype=jnp.float32)
    inst.classes = np.arange(n)
    return inst


def test_fields_and_len():
    inst = make_instances()
    assert len(inst) == 5
    assert inst.has("scores")
    assert not inst.has("masks")
    assert inst.image_size == (100, 200)
    with pytest.raises(AttributeError):
        _ = inst.nonexistent


def test_mismatched_length():
    inst = make_instances()
    with pytest.raises(AssertionError):
        inst.bad = jnp.zeros((3,))


def test_indexing():
    inst = make_instances()
    sub = inst[2:4]
    assert len(sub) == 2
    assert float(sub.scores[0]) == 2.0

    mask = np.array([True, False, True, False, True])
    sub = inst[mask]
    assert len(sub) == 3

    one = inst[1]
    assert len(one) == 1


def test_cat():
    a, b = make_instances(3), make_instances(4)
    cat = Instances.cat([a, b])
    assert len(cat) == 7
    assert len(cat.proposal_boxes) == 7


def test_pytree_through_jit():
    inst = make_instances()
    inst.remove("classes")  # numpy field would be traced; keep jax-only fields

    @jax.jit
    def f(x: Instances):
        out = Instances(x.image_size)
        out.scores = x.scores * 2
        out.proposal_boxes = x.proposal_boxes
        return out

    out = f(inst)
    assert isinstance(out, Instances)
    np.testing.assert_allclose(out.scores, np.arange(5) * 2.0)
    assert out.image_size == (100, 200)


def test_compress():
    inst = Instances((10, 10))
    inst.scores = np.array([1.0, 2.0, 3.0])
    inst.valid = np.array([True, False, True])
    c = inst.compress()
    assert len(c) == 2
    assert not c.has("valid")
