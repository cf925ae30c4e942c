"""Tests for LazyCall / LazyConfig / instantiate."""

import os

import pytest

from detectron2_tpu.config import LazyCall as L
from detectron2_tpu.config import LazyConfig, instantiate


class ShapeSpecLike:
    def __init__(self, channels=0, stride=1):
        self.channels = channels
        self.stride = stride


def test_lazycall_basic():
    cfg = L(dict)(a=1, b=2)
    assert cfg["_target_"].endswith("dict")
    obj = instantiate(cfg)
    assert obj == {"a": 1, "b": 2}


def test_lazycall_modify_then_instantiate():
    cfg = L(ShapeSpecLike)(channels=32)
    cfg.channels = 64
    obj = instantiate(cfg)
    assert obj.channels == 64
    assert obj.stride == 1


def test_instantiate_recursive():
    cfg = L(dict)(inner=L(ShapeSpecLike)(channels=8), items=[L(ShapeSpecLike)(channels=1)])
    obj = instantiate(cfg)
    assert obj["inner"].channels == 8
    assert obj["items"][0].channels == 1


def test_load_py_file(tmp_path):
    f = tmp_path / "cfg.py"
    f.write_text(
        "from detectron2_tpu.config import LazyCall as L\n"
        "model = L(dict)(x=1)\n"
        "train = dict(max_iter=100)\n"
        "_private = dict(hidden=1)\n"
        "some_int = 3\n"
    )
    cfg = LazyConfig.load(str(f))
    assert cfg.model["_target_"].endswith("dict")
    assert cfg.train.max_iter == 100
    assert "_private" not in cfg
    assert "some_int" not in cfg  # only config-object values are kept


def test_relative_import(tmp_path):
    base = tmp_path / "base_cfg.py"
    base.write_text("base_model = dict(depth=50)\n")
    child = tmp_path / "child_cfg.py"
    child.write_text(
        "from .base_cfg import base_model\n"
        "model = base_model\n"
        "model['depth'] = 101\n"
    )
    cfg = LazyConfig.load(str(child))
    assert cfg.model.depth == 101
    # reloading the base is unaffected (no module caching)
    cfg_base = LazyConfig.load(str(base))
    assert cfg_base.base_model.depth == 50


def test_apply_overrides():
    from detectron2_tpu.config.lazy import DictConfig

    cfg = DictConfig({"model": {"depth": 50, "name": "resnet"}, "train": {"lr": 0.1}})
    LazyConfig.apply_overrides(cfg, ["model.depth=101", "train.lr=0.02", "model.name=x50"])
    assert cfg.model.depth == 101
    assert cfg.train.lr == 0.02
    assert cfg.model.name == "x50"


def test_save_yaml(tmp_path):
    from detectron2_tpu.config.lazy import DictConfig

    cfg = DictConfig({"train": {"max_iter": 100}})
    out = tmp_path / "out.yaml"
    LazyConfig.save(cfg, str(out))
    assert out.exists()
    reloaded = LazyConfig.load(str(out))
    assert reloaded.train.max_iter == 100


def test_to_py():
    cfg = L(ShapeSpecLike)(channels=32)
    s = LazyConfig.to_py(cfg)
    assert "ShapeSpecLike" in s
    assert "channels=32" in s
