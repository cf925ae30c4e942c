"""Serialization helpers (reference detectron2/utils/serialize.py)."""

import cloudpickle


class PicklableWrapper:
    """Wrap an object to make it picklable via cloudpickle (lambdas, local
    functions). Used so dataloader worker processes can receive arbitrary
    mapper callables, same as reference serialize.py:6-32."""

    def __init__(self, obj):
        while isinstance(obj, PicklableWrapper):
            obj = obj._obj
        self._obj = obj

    def __reduce__(self):
        s = cloudpickle.dumps(self._obj)
        return cloudpickle.loads, (s,)

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr):
        # Ensure that the wrapped object can be used seamlessly as the previous object.
        if attr not in ["_obj"]:
            return getattr(self._obj, attr)
        return getattr(self, attr)
