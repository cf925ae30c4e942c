"""Recursive instantiation of ``_target_`` config dicts.

Mirrors reference detectron2/config/instantiate.py:37-88: any mapping with a
``_target_`` key is turned into an object by resolving the dotted name and
calling it with the (recursively instantiated) remaining keys.
"""

import collections.abc as abc
import dataclasses
import logging
from typing import Any

from detectron2_tpu.utils.registry import _convert_target_to_string, locate

__all__ = ["dump_dataclass", "instantiate"]


def dump_dataclass(obj: Any):
    """Dump a dataclass recursively into a dict that can be later instantiated."""
    assert dataclasses.is_dataclass(obj) and not isinstance(obj, type), (
        f"dump_dataclass() requires an instance of a dataclass. Got {obj}"
    )
    ret = {"_target_": _convert_target_to_string(type(obj))}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            v = dump_dataclass(v)
        if isinstance(v, (list, tuple)):
            v = [dump_dataclass(x) if dataclasses.is_dataclass(x) else x for x in v]
        ret[f.name] = v
    return ret


def instantiate(cfg: Any) -> Any:
    """Recursively instantiate objects defined in dictionaries by
    "_target_" and arguments.

    Args:
        cfg: a dict-like object with "_target_" that defines the caller, and
            other keys that define the arguments; or any other object:
            lists/tuples are instantiated elementwise, everything else is
            returned as-is.
    """
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(x) for x in cfg)

    # If input is a DictConfig backed by dataclasses (the structured-config
    # case in the reference), plain attribute access already works here.

    if isinstance(cfg, abc.Mapping) and "_target_" in cfg:
        # instantiate local lazy configs recursively;
        # _target_ itself may be a lazy config (rare).
        cls = cfg["_target_"]
        newargs = {}
        for k, v in cfg.items():
            if k == "_target_":
                continue
            newargs[k] = instantiate(v)

        if isinstance(cls, str):
            cls_name = cls
            cls = locate(cls_name)
            assert cls is not None, cls_name
        else:
            cls = instantiate(cls) if isinstance(cls, abc.Mapping) else cls
            try:
                cls_name = cls.__module__ + "." + cls.__qualname__
            except Exception:
                cls_name = str(cls)
        if not callable(cls):
            raise TypeError(f"_target_ {cls_name} does not define a callable object")
        try:
            return cls(**newargs)
        except TypeError:
            logger = logging.getLogger(__name__)
            logger.error(f"Error when instantiating {cls_name}!")
            raise

    if isinstance(cfg, abc.Mapping):
        # keep it a mapping but instantiate values (so users can hold dicts of models)
        return {k: instantiate(v) for k, v in cfg.items()}

    return cfg  # return as-is
