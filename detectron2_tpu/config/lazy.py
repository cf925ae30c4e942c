"""Lazy, python-first configuration.

Re-implements the reference's LazyConfig system (detectron2/config/lazy.py)
without the omegaconf dependency: ``LazyCall`` wraps a callable into a plain
attribute-dict with a ``_target_`` key; ``LazyConfig.load`` executes a python
config file in a synthetic module namespace with patched relative imports;
``apply_overrides`` implements the ``a.b.c=value`` dotted override grammar.
"""

import ast
import builtins
import copy as copy_module
import importlib.util
import logging
import os
import pickle
import uuid
from collections import abc
from contextlib import contextmanager
from typing import Any, Dict, List, Tuple, Union

import yaml

from detectron2_tpu.utils.file_io import PathManager
from detectron2_tpu.utils.registry import _convert_target_to_string

__all__ = ["LazyCall", "LazyConfig", "DictConfig", "ListConfig"]


class DictConfig(dict):
    """A dict with attribute access, used as the node type of lazy configs.
    Stands in for omegaconf.DictConfig in the reference design."""

    def __init__(self, init: Dict[str, Any] = None, flags: Dict[str, bool] = None):
        init = init or {}
        super().__init__()
        for k, v in init.items():
            self[k] = _to_config(v)
        # flags kept for API compatibility with omegaconf (e.g. allow_objects)
        self.__dict__["_flags"] = flags or {}

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError:
            raise AttributeError(
                f"key '{name}' not found in config. Available: {sorted(self.keys())}"
            )

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _to_config(value)

    def __delattr__(self, name: str) -> None:
        del self[name]

    def __deepcopy__(self, memo):
        new = DictConfig()
        for k, v in self.items():
            new[k] = copy_module.deepcopy(v, memo)
        new.__dict__["_flags"] = dict(self.__dict__.get("_flags", {}))
        return new


class ListConfig(list):
    """A list node of lazy configs."""

    def __init__(self, init=None):
        super().__init__(_to_config(v) for v in (init or []))


def _to_config(value: Any) -> Any:
    """Recursively convert plain dict/list containers to config nodes. Leaves
    callables, tuples and other objects intact (configs may hold real objects)."""
    if isinstance(value, (DictConfig, ListConfig)):
        return value
    if isinstance(value, dict):
        return DictConfig(value)
    if isinstance(value, list):
        return ListConfig(value)
    return value


def _is_lazy_node(obj: Any) -> bool:
    return isinstance(obj, abc.Mapping) and "_target_" in obj


class LazyCall:
    """Wrap a callable so that when it's called, the call will not be executed
    but returned as a dict that describes the call (reference lazy.py:25-58).

    Example::

        from detectron2_tpu.config import instantiate, LazyCall as L
        layer_cfg = L(nn.Conv2d)(in_channels=32, out_channels=32)
        layer_cfg.out_channels = 64    # modify it afterwards
        layer = instantiate(layer_cfg)
    """

    def __init__(self, target):
        if not (callable(target) or isinstance(target, (str, abc.Mapping))):
            raise TypeError(
                f"target of LazyCall must be a callable or defines a callable! Got {target}"
            )
        self._target = target

    def __call__(self, **kwargs):
        if isinstance(self._target, (str, abc.Mapping)):
            target = self._target
        else:
            # Functions defined inside a config file (exec'd in a synthetic
            # module) have no importable dotted name — keep the callable
            # itself; instantiate() accepts callables, and LazyConfig.save
            # falls back to pickle for them (same behavior as the reference's
            # omegaconf-backed LazyCall).
            try:
                target = _convert_target_to_string(self._target)
                # classes exec'd in a config namespace stringify to a bogus
                # module (e.g. "builtins.X"); keep the object unless the
                # string really resolves back to it
                from detectron2_tpu.utils.registry import locate

                if locate(target) is not self._target:
                    target = self._target
            except Exception:
                target = self._target
        kwargs["_target_"] = target
        return DictConfig(init=kwargs, flags={"allow_objects": True})


def _visit_dict_config(cfg: Any, func) -> None:
    """Apply func recursively to all DictConfig in cfg."""
    if isinstance(cfg, abc.Mapping):
        func(cfg)
        for v in cfg.values():
            _visit_dict_config(v, func)
    elif isinstance(cfg, (list, tuple)):
        for v in cfg:
            _visit_dict_config(v, func)


def _validate_py_syntax(filename: str) -> None:
    with PathManager.open(filename, "r") as f:
        content = f.read()
    try:
        ast.parse(content)
    except SyntaxError as e:
        raise SyntaxError(f"Config file {filename} has syntax error!") from e


def _cast_to_config(obj: Any) -> Any:
    return _to_config(obj)


_CFG_PACKAGE_NAME = "detectron2_tpu._cfg_loader"
"""
A namespace to put all imported config into.
"""


def _random_package_name(filename: str) -> str:
    # generate a random package name when loading config files
    return _CFG_PACKAGE_NAME + str(uuid.uuid4())[:4] + "." + os.path.basename(filename)


@contextmanager
def _patch_import():
    """Enhance relative import statements in config files so that they:
    1. locate files purely based on relative location, regardless of packages.
       e.g. you can import file without having __init__
    2. do not cache modules globally; modifications of module states has no side effect
    3. support other storage system through PathManager, so config files can be in the cloud
    4. imported dict are turned into DictConfig automatically

    (Mirrors reference lazy.py:102-171.)
    """
    default_import = builtins.__import__

    def find_relative_file(original_file, relative_import_path, level):
        # NOTE: "from . import x" is not handled. Because then it's unclear
        # if such import should produce `x` as a python module or DictConfig.
        # This can be discussed further if needed.
        relative_import_err = (
            "Relative import of directories is not allowed within config files. "
            "Within a config file, relative import can only import other config files."
        )
        if not len(relative_import_path):
            raise ImportError(relative_import_err)

        cur_file = os.path.dirname(original_file)
        for _ in range(level - 1):
            cur_file = os.path.dirname(cur_file)
        cur_name = relative_import_path.lstrip(".")
        for part in cur_name.split("."):
            cur_file = os.path.join(cur_file, part)
        if not cur_file.endswith(".py"):
            cur_file += ".py"
        if not PathManager.isfile(cur_file):
            cur_file_no_suffix = cur_file[: -len(".py")]
            if PathManager.isdir(cur_file_no_suffix):
                raise ImportError(f"Cannot import from {cur_file_no_suffix}." + relative_import_err)
            else:
                raise ImportError(
                    f"Cannot import name {relative_import_path} from {original_file}: {cur_file} does not exist."
                )
        return cur_file

    def new_import(name, globals=None, locals=None, fromlist=(), level=0):
        if (
            # Only deal with relative imports inside config files
            level != 0
            and globals is not None
            and (globals.get("__package__", "") or "").startswith(_CFG_PACKAGE_NAME)
        ):
            cur_file = find_relative_file(globals["__file__"], name, level)
            _validate_py_syntax(cur_file)
            spec = importlib.machinery.ModuleSpec(
                _random_package_name(cur_file), None, origin=cur_file
            )
            module = importlib.util.module_from_spec(spec)
            module.__file__ = cur_file
            with PathManager.open(cur_file) as f:
                content = f.read()
            exec(compile(content, cur_file, "exec"), module.__dict__)
            for name_ in fromlist:  # turn imported dict into DictConfig automatically
                val = _cast_to_config(module.__dict__[name_])
                module.__dict__[name_] = val
            return module
        return default_import(name, globals, locals, fromlist=fromlist, level=level)

    builtins.__import__ = new_import
    yield new_import
    builtins.__import__ = default_import


class LazyConfig:
    """Provide methods to save, load, and override configurations
    (reference lazy.py:174-420)."""

    @staticmethod
    def load_rel(filename: str, keys=None):
        """Like :meth:`load`, but filename is relative to the caller's source file."""
        import inspect

        caller_frame = inspect.stack()[1]
        caller_fname = caller_frame[0].f_code.co_filename
        assert caller_fname != "<string>", "load_rel Unable to find caller"
        caller_dir = os.path.dirname(caller_fname)
        filename = os.path.join(caller_dir, filename)
        return LazyConfig.load(filename, keys)

    @staticmethod
    def load(filename: str, keys=None):
        """Load a config file.

        Args:
            filename: absolute path or relative path w.r.t. the current working directory
            keys: keys to load and return. If not given, return all keys
                (whose values are config objects) in a dict.
        """
        has_keys = keys is not None
        filename = filename.replace("/./", "/")  # redundant
        if os.path.splitext(filename)[1] not in [".py", ".yaml", ".yml"]:
            raise ValueError(f"Config file {filename} has to be a python or yaml file.")
        if filename.endswith(".py"):
            _validate_py_syntax(filename)

            with _patch_import():
                # Record the filename
                module_namespace = {
                    "__file__": filename,
                    "__package__": _random_package_name(filename),
                }
                with PathManager.open(filename) as f:
                    content = f.read()
                # Compile first with filename to:
                # 1. make filename appears in stacktrace
                # 2. make load_rel able to find its parent's (possibly remote) location
                exec(compile(content, filename, "exec"), module_namespace)

            ret = module_namespace
        else:
            with PathManager.open(filename) as f:
                obj = yaml.unsafe_load(f)
            ret = DictConfig(obj)

        if has_keys:
            if isinstance(keys, str):
                return _cast_to_config(ret[keys])
            return tuple(_cast_to_config(ret[a]) for a in keys)
        else:
            if filename.endswith(".py"):
                # when not specified, only load those that are config objects
                ret = DictConfig(
                    {
                        name: _cast_to_config(value)
                        for name, value in ret.items()
                        if isinstance(value, (DictConfig, ListConfig, dict, list))
                        and not name.startswith("_")
                    },
                    flags={"allow_objects": True},
                )
            return ret

    @staticmethod
    def save(cfg, filename: str) -> None:
        """Save a config object to a yaml file (falls back to pickle for
        unserializable objects, same as the reference)."""
        logger = logging.getLogger(__name__)
        try:
            cfg = copy_module.deepcopy(cfg)
        except Exception:
            pass

        try:
            dumped = yaml.dump(
                _to_plain(cfg), default_flow_style=False, allow_unicode=True, width=9999
            )
            with PathManager.open(filename, "w") as f:
                f.write(dumped)

            try:
                _ = yaml.unsafe_load(dumped)  # test that it is loadable
            except Exception:
                logger.warning(
                    "The config contains objects that cannot serialize to a valid yaml. "
                    f"{filename} is human-readable but cannot be loaded."
                )
        except Exception:
            logger.exception("Unable to serialize the config to yaml. Error:")
            new_filename = filename + ".pkl"
            try:
                with PathManager.open(new_filename, "wb") as f:
                    pickle.dump(cfg, f)
                logger.warning(f"Config is saved using pickle at {new_filename}.")
            except Exception:
                pass

    @staticmethod
    def apply_overrides(cfg, overrides: List[str]):
        """In-place override contents of cfg with a list of ``a.b.c=value``
        strings (the hydra-style grammar used by lazyconfig_train_net.py)."""
        for o in overrides:
            if "=" not in o:
                raise ValueError(f"Cannot parse override: {o}; expected key=value")
            key, value = o.split("=", 1)
            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass  # keep as string
            _set_dotted(cfg, key, value)
        return cfg

    @staticmethod
    def to_py(cfg, prefix: str = "cfg.") -> str:
        """Try to convert a config object into python-like pseudocode
        (reference lazy.py:374)."""

        def _to_str(obj, prefix=None, inside_call=False):
            if prefix is None:
                prefix = []
            if isinstance(obj, abc.Mapping) and "_target_" in obj:
                # it's a call; convert to pythonic call syntax
                target = obj["_target_"]
                args = []
                for k, v in sorted(obj.items()):
                    if k == "_target_":
                        continue
                    args.append(f"{k}={_to_str(v, inside_call=True)}")
                call = f"{target}({', '.join(args)})"
                return "".join(prefix) + call
            elif isinstance(obj, abc.Mapping) and not inside_call:
                # a dict of keys to assign
                key_list = []
                for k, v in sorted(obj.items()):
                    if isinstance(v, abc.Mapping) and "_target_" not in v:
                        key_list.append(_to_str(v, prefix=prefix + [k + "."]))
                    else:
                        key = "".join(prefix) + k
                        key_list.append(f"{key}={_to_str(v)}")
                return "\n".join(key_list)
            elif isinstance(obj, abc.Mapping):
                return (
                    "dict(" + ",".join(f"{k}={_to_str(v, inside_call=True)}" for k, v in sorted(obj.items())) + ")"
                )
            elif isinstance(obj, (list, tuple)):
                inner = ",".join(_to_str(x, inside_call=inside_call) for x in obj)
                return ("[" + inner + "]") if isinstance(obj, list) else ("(" + inner + ")")
            else:
                return repr(obj)

        py_str = _to_str(cfg, prefix=[prefix])
        try:
            import black

            return black.format_str(py_str, mode=black.Mode())
        except Exception:
            return py_str


def _set_dotted(cfg, dotted_key: str, value) -> None:
    keys = dotted_key.split(".")
    cur = cfg
    for k in keys[:-1]:
        if isinstance(cur, abc.Mapping):
            if k not in cur:
                cur[k] = DictConfig()
            cur = cur[k]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(k)]
        else:
            cur = getattr(cur, k)
    last = keys[-1]
    if isinstance(cur, abc.MutableMapping):
        cur[last] = _to_config(value)
    elif isinstance(cur, list):
        cur[int(last)] = _to_config(value)
    else:
        setattr(cur, last, value)


def _to_plain(obj: Any) -> Any:
    """Convert config nodes back to plain containers for yaml dumping."""
    if isinstance(obj, abc.Mapping):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = list if isinstance(obj, list) else tuple
        return t(_to_plain(v) for v in obj)
    return obj
