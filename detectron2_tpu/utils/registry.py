"""Registry: name -> object mapping used to decouple config strings from classes.

TPU-native re-design of the registry machinery the reference gets from fvcore
(see reference detectron2/utils/registry.py:1-60). Pure python, no torch.
"""

from typing import Any, Dict, Iterable, Iterator, Optional, Tuple
import pydoc


class Registry:
    """A registry providing name -> object mapping, to support third-party
    users' custom modules.

    To create a registry (e.g. a backbone registry)::

        BACKBONE_REGISTRY = Registry('BACKBONE')

    To register an object::

        @BACKBONE_REGISTRY.register()
        class MyBackbone:
            ...

    Or::

        BACKBONE_REGISTRY.register(MyBackbone)
    """

    def __init__(self, name: str) -> None:
        self._name: str = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise ValueError(
                f"An object named '{name}' was already registered in '{self._name}' registry!"
            )
        self._obj_map[name] = obj

    def register(self, obj: Any = None) -> Any:
        """Register the given object under ``obj.__name__``.
        Can be used as a decorator or a function call.
        """
        if obj is None:
            # used as a decorator
            def deco(func_or_class: Any) -> Any:
                self._do_register(func_or_class.__name__, func_or_class)
                return func_or_class

            return deco
        # used as a function call
        self._do_register(obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(
                f"No object named '{name}' found in '{self._name}' registry! "
                f"Available: {sorted(self._obj_map.keys())}"
            )
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __repr__(self) -> str:
        return f"Registry of {self._name}: {sorted(self._obj_map.keys())}"

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self) -> Iterable[str]:
        return self._obj_map.keys()

    __str__ = __repr__


def locate(name: str) -> Any:
    """Locate and return an object ``x`` using its fully qualified name
    ``"path.to.x"`` (reference detectron2/utils/registry.py:40)."""
    obj = pydoc.locate(name)

    if obj is None:
        # pydoc.locate fails for cases like "module.submodule.Class.attr";
        # walk the attribute chain manually.
        parts = name.split(".")
        for i in range(len(parts) - 1, 0, -1):
            mod = pydoc.locate(".".join(parts[:i]))
            if mod is not None:
                obj = mod
                for attr in parts[i:]:
                    obj = getattr(obj, attr)
                return obj
        raise ImportError(f"Cannot locate object '{name}'!")
    return obj


def _convert_target_to_string(t: Any) -> str:
    """Inverse of ``locate()`` (reference detectron2/utils/registry.py:15)."""
    module, qualname = t.__module__, t.__qualname__

    # Compress the path to this object (module shortening): try to use the
    # shortest prefix of the module path that still resolves to the object.
    module_parts = module.split(".")
    for k in range(1, len(module_parts)):
        prefix = ".".join(module_parts[:k])
        candidate = f"{prefix}.{qualname}"
        try:
            if locate(candidate) is t:
                return candidate
        except Exception:
            pass
    return f"{module}.{qualname}"
