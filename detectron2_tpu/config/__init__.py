from detectron2_tpu.config.cfg_node import CfgNode
from detectron2_tpu.config.compat import downgrade_config, upgrade_config
from detectron2_tpu.config.config import configurable, get_cfg, global_cfg, set_global_cfg
from detectron2_tpu.config.instantiate import dump_dataclass, instantiate
from detectron2_tpu.config.lazy import DictConfig, LazyCall, LazyConfig, ListConfig

__all__ = [
    "CfgNode",
    "get_cfg",
    "global_cfg",
    "set_global_cfg",
    "downgrade_config",
    "upgrade_config",
    "configurable",
    "instantiate",
    "dump_dataclass",
    "LazyCall",
    "LazyConfig",
    "DictConfig",
    "ListConfig",
]
