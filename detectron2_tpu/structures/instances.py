"""Instances: a per-image bag of equal-length fields.

Parity with reference detectron2/structures/instances.py:8-194 (attribute
access, indexing/slicing, cat), re-designed for jax:

- Registered as a pytree: fields are leaves, image_size and field names are
  static aux data. Instances can therefore cross jit boundaries, but only with
  static shapes — this is THE core dynamic-shape container of detectron2, and
  inside compiled step functions this framework instead uses fixed-size padded
  arrays plus a boolean validity mask (SURVEY.md §7.1). By convention, a
  padded Instances carries a boolean ``valid`` field; host-side code can call
  :meth:`compress` to drop padding after device→host transfer.
"""

import itertools
from typing import Any, Dict, List, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Instances"]


@jax.tree_util.register_pytree_node_class
class Instances:
    """
    This class represents a list of instances in an image.
    It stores the attributes of instances (e.g., boxes, masks, labels, scores) as "fields".
    All fields must have the same ``__len__`` which is the number of instances.

    All other (non-field) attributes of this class are considered private:
    they must start with '_' and are not modifiable by a user.

    Some basic usage:

    1. Set/get/check a field:

       .. code-block:: python

          instances.gt_boxes = Boxes(...)
          print(instances.pred_masks)
          print('gt_masks' in instances)

    2. ``len(instances)`` returns the number of instances
    3. Indexing: ``instances[indices]`` will apply the indexing on all the fields
       and returns a new :class:`Instances`.
       Typically, ``indices`` is an integer vector of indices,
       or a binary mask of length ``num_instances``
    """

    def __init__(self, image_size: Tuple[int, int], **kwargs: Any):
        """
        Args:
            image_size (height, width): the spatial size of the image.
            kwargs: fields to add to this `Instances`.
        """
        self._image_size = tuple(int(x) for x in image_size)
        self._fields: Dict[str, Any] = {}
        for k, v in kwargs.items():
            self.set(k, v)

    # ---------------------------------------------------------------- pytree
    def tree_flatten(self):
        keys = sorted(self._fields.keys())
        children = tuple(self._fields[k] for k in keys)
        return children, (self._image_size, tuple(keys))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, keys = aux
        obj = cls.__new__(cls)
        obj.__dict__["_image_size"] = image_size
        obj.__dict__["_fields"] = dict(zip(keys, children))
        return obj

    # ----------------------------------------------------------------- api
    @property
    def image_size(self) -> Tuple[int, int]:
        """Returns: tuple: height, width"""
        return self._image_size

    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name: str) -> Any:
        if name == "_fields" or name not in self._fields:
            raise AttributeError(f"Cannot find field '{name}' in the given Instances!")
        return self._fields[name]

    def set(self, name: str, value: Any) -> None:
        """Set the field named `name` to `value`; value must have the same
        length as other existing fields."""
        data_len = _field_len(value)
        if len(self._fields):
            assert (
                len(self) == data_len
            ), f"Adding a field of length {data_len} to a Instances of length {len(self)}"
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get(self, name: str) -> Any:
        return self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        """Returns the dict of fields (modifying it modifies this object)."""
        return self._fields

    # ------------------------------------------------------------- tensor-ish
    def to(self, *args: Any, **kwargs: Any) -> "Instances":
        """Device placement is managed by jax; kept for API parity. Fields with
        a ``to`` method get it called."""
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if hasattr(v, "to"):
                v = v.to(*args, **kwargs)
            ret.set(k, v)
        return ret

    def numpy(self) -> "Instances":
        """Copy all array fields to host numpy arrays."""
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if isinstance(v, jnp.ndarray):
                v = np.asarray(v)
            elif hasattr(v, "tensor") and isinstance(v.tensor, jnp.ndarray):
                v = type(v)(np.asarray(v.tensor))
            ret.set(k, v)
        return ret

    def __getitem__(self, item: Union[int, slice, np.ndarray]) -> "Instances":
        """
        Args:
            item: an index-like object that will be used to index all the fields.

        Returns:
            If `item` is a string, return the data in the corresponding field.
            Otherwise, returns an `Instances` where all fields are indexed by `item`.
        """
        if type(item) is int:
            if item >= len(self) or item < -len(self):
                raise IndexError("Instances index out of range!")
            else:
                item = slice(item, None, len(self))

        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if isinstance(v, list) and not isinstance(item, slice):
                # plain-list fields (e.g. per-detection map dicts) don't take
                # numpy boolean/fancy indices — select elementwise instead
                idx = np.asarray(item)
                if idx.dtype == np.bool_:
                    idx = np.nonzero(idx)[0]
                ret.set(k, [v[int(i)] for i in idx])
            elif hasattr(v, "__getitem__") and not isinstance(v, (str, bytes)):
                ret.set(k, v[item])
            else:
                ret.set(k, v)
        return ret

    def compress(self) -> "Instances":
        """Drop padding rows using the boolean ``valid`` field (host-side;
        produces data-dependent shapes so never call under jit)."""
        if not self.has("valid"):
            return self
        valid = np.asarray(self.get("valid")).astype(bool)
        ret = self[valid]
        ret.remove("valid")
        return ret

    def __len__(self) -> int:
        for v in self._fields.values():
            return _field_len(v)
        raise NotImplementedError("Empty Instances does not support __len__!")

    def __iter__(self):
        raise NotImplementedError("`Instances` object is not iterable!")

    @staticmethod
    def cat(instance_lists: List["Instances"]) -> "Instances":
        """Concatenate Instances with the same image size and fields
        (reference instances.py:154)."""
        assert all(isinstance(i, Instances) for i in instance_lists)
        assert len(instance_lists) > 0
        if len(instance_lists) == 1:
            return instance_lists[0]

        image_size = instance_lists[0].image_size
        if not isinstance(image_size, jnp.ndarray):  # could be a tensor in tracing
            for i in instance_lists[1:]:
                assert i.image_size == image_size
        ret = Instances(image_size)
        for k in instance_lists[0]._fields.keys():
            values = [i.get(k) for i in instance_lists]
            v0 = values[0]
            if isinstance(v0, (np.ndarray,)):
                values = np.concatenate(values, axis=0)
            elif isinstance(v0, jnp.ndarray):
                values = jnp.concatenate(values, axis=0)
            elif isinstance(v0, list):
                values = list(itertools.chain(*values))
            elif hasattr(type(v0), "cat"):
                values = type(v0).cat(values)
            else:
                raise ValueError(f"Unsupported type {type(v0)} for concatenation")
            ret.set(k, values)
        return ret

    def __str__(self) -> str:
        s = self.__class__.__name__ + "("
        s += f"num_instances={len(self) if self._fields else 0}, "
        s += f"image_height={self._image_size[0]}, "
        s += f"image_width={self._image_size[1]}, "
        s += "fields=[{}])".format(
            ", ".join(f"{k}: {v}" for k, v in self._fields.items())
        )
        return s

    __repr__ = __str__


def _field_len(value: Any) -> int:
    if hasattr(value, "shape"):
        return int(value.shape[0])
    return len(value)
