"""A yacs-compatible hierarchical config node.

Self-contained re-implementation of the yacs ``CfgNode`` semantics the
reference relies on (see reference detectron2/config/config.py:12-93 which
subclasses fvcore/yacs CfgNode): attribute access, freeze/defrost, typed
merging, ``_BASE_`` yaml inheritance, merge_from_list, yaml dump. No yacs /
fvcore dependency.
"""

import copy
import io
import logging
import os
from ast import literal_eval
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["CfgNode"]

_VALID_TYPES = {tuple, list, str, int, float, bool, type(None)}

BASE_KEY = "_BASE_"


def _assert_with_logging(cond: bool, msg: str) -> None:
    if not cond:
        logging.getLogger(__name__).debug(msg)
    assert cond, msg


def _valid_type(value: Any, allow_cfg_node: bool = False) -> bool:
    return (type(value) in _VALID_TYPES) or (allow_cfg_node and isinstance(value, CfgNode))


def _decode_cfg_value(value: Any) -> Any:
    """Decode a raw config value (e.g., from yaml or a string) into a python
    object, interpreting strings as python literals where possible."""
    if isinstance(value, dict):
        return CfgNode(value)
    if not isinstance(value, str):
        return value
    try:
        value = literal_eval(value)
    except (ValueError, SyntaxError):
        pass
    return value


def _check_and_coerce_cfg_value_type(replacement: Any, original: Any, key: str, full_key: str) -> Any:
    """Check that `replacement`'s type matches `original`'s; coerce the known
    compatible cases (list <-> tuple, str <-> unicode, None)."""
    original_type = type(original)
    replacement_type = type(replacement)

    if replacement_type == original_type or original is None:
        return replacement
    # allow promoting int to float
    if original_type is float and replacement_type is int:
        return float(replacement)

    def conditional_cast(from_type, to_type):
        if replacement_type == from_type and original_type == to_type:
            return True, to_type(replacement)
        return False, None

    casts = [(tuple, list), (list, tuple)]
    for from_type, to_type in casts:
        converted, converted_value = conditional_cast(from_type, to_type)
        if converted:
            return converted_value

    raise ValueError(
        f"Type mismatch ({original_type} vs. {replacement_type}) with values "
        f"({original} vs. {replacement}) for config key: {full_key}"
    )


class CfgNode(dict):
    """CfgNode is a node in the configuration tree. It's a simple wrapper
    around a dict and supports attribute-style access."""

    IMMUTABLE = "__immutable__"
    DEPRECATED_KEYS = "__deprecated_keys__"
    RENAMED_KEYS = "__renamed_keys__"
    NEW_ALLOWED = "__new_allowed__"

    def __init__(
        self,
        init_dict: Optional[Dict[str, Any]] = None,
        key_list: Optional[List[str]] = None,
        new_allowed: bool = False,
    ):
        init_dict = {} if init_dict is None else init_dict
        key_list = [] if key_list is None else key_list
        init_dict = self._create_config_tree_from_dict(init_dict, key_list)
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False
        self.__dict__[CfgNode.DEPRECATED_KEYS] = set()
        self.__dict__[CfgNode.RENAMED_KEYS] = {}
        self.__dict__[CfgNode.NEW_ALLOWED] = new_allowed

    @classmethod
    def _create_config_tree_from_dict(cls, dic: Dict[str, Any], key_list: List[str]):
        dic = copy.deepcopy(dic)
        for k, v in dic.items():
            if isinstance(v, dict):
                dic[k] = cls(v, key_list=key_list + [k])
            else:
                _assert_with_logging(
                    _valid_type(v, allow_cfg_node=False),
                    f"Key {'.'.join(key_list + [k])} with value {type(v)} is not a valid type",
                )
        return dic

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(
            f"Attribute '{name}' does not exist in CfgNode. Available keys: {sorted(self.keys())}"
        )

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Attempted to set '{name}' to '{value}', but CfgNode is immutable")
        _assert_with_logging(
            name not in self.__dict__, f"Invalid attempt to modify internal CfgNode state: {name}"
        )
        _assert_with_logging(
            _valid_type(value, allow_cfg_node=True),
            f"Invalid type {type(value)} for key {name}; valid types = {_VALID_TYPES}",
        )
        self[name] = value

    def __str__(self) -> str:
        def _indent(s_, num_spaces):
            s = s_.split("\n")
            if len(s) == 1:
                return s_
            first = s.pop(0)
            s = [(num_spaces * " ") + line for line in s]
            return first + "\n" + "\n".join(s)

        r = ""
        s = []
        for k, v in sorted(self.items()):
            seperator = "\n" if isinstance(v, CfgNode) else " "
            attr_str = f"{str(k)}:{seperator}{str(v)}"
            attr_str = _indent(attr_str, 2)
            s.append(attr_str)
        r += "\n".join(s)
        return r

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"

    def dump(self, **kwargs) -> str:
        """Dump to a yaml string."""

        def convert_to_dict(cfg_node, key_list):
            if not isinstance(cfg_node, CfgNode):
                _assert_with_logging(
                    _valid_type(cfg_node),
                    f"Key {'.'.join(key_list)} with value {type(cfg_node)} is not a valid type",
                )
                return cfg_node
            cfg_dict = dict(cfg_node)
            for k, v in cfg_dict.items():
                cfg_dict[k] = convert_to_dict(v, key_list + [k])
            return cfg_dict

        self_as_dict = convert_to_dict(self, [])
        kwargs.setdefault("default_flow_style", None)
        return yaml.safe_dump(self_as_dict, **kwargs)

    def merge_from_other_cfg(self, cfg_other: "CfgNode") -> None:
        _merge_a_into_b(cfg_other, self, self, [])

    def merge_from_list(self, cfg_list: List[Any]) -> None:
        """Merge config (keys, values) in a list (e.g., from command line)."""
        _assert_with_logging(
            len(cfg_list) % 2 == 0, f"Override list has odd length: {cfg_list}"
        )
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if full_key in self.__dict__[CfgNode.DEPRECATED_KEYS]:
                logging.getLogger(__name__).warning("Deprecated key is used: %s", full_key)
                continue
            if full_key in self.__dict__[CfgNode.RENAMED_KEYS]:
                self._raise_key_rename_error(full_key)
            key_list = full_key.split(".")
            d = self
            for subkey in key_list[:-1]:
                _assert_with_logging(subkey in d, f"Non-existent key: {full_key}")
                d = d[subkey]
            subkey = key_list[-1]
            _assert_with_logging(subkey in d, f"Non-existent key: {full_key}")
            value = _decode_cfg_value(v)
            value = _check_and_coerce_cfg_value_type(value, d[subkey], subkey, full_key)
            d[subkey] = value

    def freeze(self) -> None:
        self._immutable(True)

    def defrost(self) -> None:
        self._immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _immutable(self, is_immutable: bool) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = is_immutable
        for v in self.__dict__.values():
            if isinstance(v, CfgNode):
                v._immutable(is_immutable)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._immutable(is_immutable)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def register_deprecated_key(self, key: str) -> None:
        _assert_with_logging(
            key not in self.__dict__[CfgNode.DEPRECATED_KEYS],
            f"key {key} is already registered as a deprecated key",
        )
        self.__dict__[CfgNode.DEPRECATED_KEYS].add(key)

    def register_renamed_key(self, old_name: str, new_name: str, message: Optional[str] = None):
        _assert_with_logging(
            old_name not in self.__dict__[CfgNode.RENAMED_KEYS],
            f"key {old_name} is already registered as a renamed cfg key",
        )
        value = new_name
        if message:
            value = (new_name, message)
        self.__dict__[CfgNode.RENAMED_KEYS][old_name] = value

    def _raise_key_rename_error(self, full_key: str):
        new_key = self.__dict__[CfgNode.RENAMED_KEYS][full_key]
        if isinstance(new_key, tuple):
            msg = " Note: " + new_key[1]
            new_key = new_key[0]
        else:
            msg = ""
        raise KeyError(
            f"Key {full_key} was renamed to {new_key}; please update your config.{msg}"
        )

    def is_new_allowed(self) -> bool:
        return self.__dict__[CfgNode.NEW_ALLOWED]

    def set_new_allowed(self, is_new_allowed: bool) -> None:
        self.__dict__[CfgNode.NEW_ALLOWED] = is_new_allowed
        for v in self.values():
            if isinstance(v, CfgNode):
                v.set_new_allowed(is_new_allowed)

    @classmethod
    def load_cfg(cls, cfg_file_obj_or_str):
        if isinstance(cfg_file_obj_or_str, str):
            return cls(yaml.safe_load(cfg_file_obj_or_str) or {})
        return cls(yaml.safe_load(cfg_file_obj_or_str.read()) or {})

    @classmethod
    def load_yaml_with_base(cls, filename: str, allow_unsafe: bool = False) -> Dict[str, Any]:
        """Load a yaml file supporting ``_BASE_`` inheritance (same protocol as
        fvcore's load_yaml_with_base, used by reference config.py:32)."""
        from detectron2_tpu.utils.file_io import PathManager

        with PathManager.open(filename, "r") as f:
            try:
                cfg = yaml.safe_load(f)
            except yaml.constructor.ConstructorError:
                if not allow_unsafe:
                    raise
                logging.getLogger(__name__).warning(
                    "Loading config %s with yaml.unsafe_load. Your machine may "
                    "be at risk if the file contains malicious content.",
                    filename,
                )
                f.close()
                with PathManager.open(filename, "r") as f2:
                    cfg = yaml.unsafe_load(f2)
        if cfg is None:
            cfg = {}

        def merge_a_into_b(a, b):
            # merge dict a into dict b. values in a will overwrite b.
            for k, v in a.items():
                if isinstance(v, dict) and k in b and isinstance(b[k], dict):
                    merge_a_into_b(v, b[k])
                else:
                    b[k] = v

        def _load_with_base(base_cfg_file: str) -> Dict[str, Any]:
            if base_cfg_file.startswith("~"):
                base_cfg_file = os.path.expanduser(base_cfg_file)
            if not any(map(base_cfg_file.startswith, ["/", "https://", "http://", "detectron2://"])):
                # the path to base cfg is relative to the config file itself.
                base_cfg_file = os.path.join(os.path.dirname(filename), base_cfg_file)
            return cls.load_yaml_with_base(base_cfg_file, allow_unsafe=allow_unsafe)

        if BASE_KEY in cfg:
            if isinstance(cfg[BASE_KEY], list):
                base_cfg: Dict[str, Any] = {}
                for base in cfg[BASE_KEY]:
                    merge_a_into_b(_load_with_base(base), base_cfg)
            else:
                base_cfg = _load_with_base(cfg[BASE_KEY])
            del cfg[BASE_KEY]
            merge_a_into_b(cfg, base_cfg)
            return base_cfg
        return cfg

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = True) -> None:
        """Merge configs from a given yaml file (supports ``_BASE_``).

        Mirrors reference detectron2/config/config.py:30-56 including the
        version-compat path.
        """
        loaded_cfg_dict = self.load_yaml_with_base(cfg_filename, allow_unsafe=allow_unsafe)
        loaded_cfg = type(self)(loaded_cfg_dict)

        from detectron2_tpu.config.defaults import _C

        latest_ver = _C.VERSION
        assert latest_ver == self.VERSION, "CfgNode.merge_from_file is only allowed on a config object of latest version!"

        loaded_ver = loaded_cfg.get("VERSION", None)
        if loaded_ver is None:
            from detectron2_tpu.config.compat import guess_version

            loaded_ver = guess_version(loaded_cfg, cfg_filename)
        assert loaded_ver <= self.VERSION, f"Cannot merge a v{loaded_ver} config into a v{self.VERSION} config."

        if loaded_ver == self.VERSION:
            self.merge_from_other_cfg(loaded_cfg)
        else:
            from detectron2_tpu.config.compat import downgrade_config, upgrade_config

            logging.getLogger(__name__).warning(
                "Loading an old v%s config file '%s' by automatically upgrading to v%s.",
                loaded_ver,
                cfg_filename,
                self.VERSION,
            )
            old_self = downgrade_config(self, to_version=loaded_ver)
            old_self.merge_from_other_cfg(loaded_cfg)
            new_config = upgrade_config(old_self)
            self.clear()
            self.update(new_config)


def _merge_a_into_b(a: CfgNode, b: CfgNode, root: CfgNode, key_list: List[str]) -> None:
    """Merge CfgNode a into CfgNode b, clobbering the options in b."""
    _assert_with_logging(isinstance(a, CfgNode), f"`a` (cur type {type(a)}) must be a CfgNode")
    _assert_with_logging(isinstance(b, CfgNode), f"`b` (cur type {type(b)}) must be a CfgNode")

    for k, v_ in a.items():
        full_key = ".".join(key_list + [k])
        v = copy.deepcopy(v_)
        v = _decode_cfg_value(v)

        if k in b:
            v = _check_and_coerce_cfg_value_type(v, b[k], k, full_key)
            if isinstance(v, CfgNode):
                try:
                    _merge_a_into_b(v, b[k], root, key_list + [k])
                except BaseException:
                    raise
            else:
                b[k] = v
        elif b.is_new_allowed():
            b[k] = v
        else:
            if root.key_is_deprecated(full_key):
                continue
            if root.key_is_renamed(full_key):
                root._raise_key_rename_error(full_key)
            raise KeyError(f"Non-existent config key: {full_key}")


# add helpers used by _merge_a_into_b onto CfgNode
def _key_is_deprecated(self, full_key: str) -> bool:
    if full_key in self.__dict__[CfgNode.DEPRECATED_KEYS]:
        return True
    return False


def _key_is_renamed(self, full_key: str) -> bool:
    return full_key in self.__dict__[CfgNode.RENAMED_KEYS]


CfgNode.key_is_deprecated = _key_is_deprecated
CfgNode.key_is_renamed = _key_is_renamed
