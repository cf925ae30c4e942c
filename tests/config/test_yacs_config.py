"""Tests for the yacs-compatible CfgNode (mirrors reference tests/config/test_yacs_config.py)."""

import os
import tempfile

import pytest

from detectron2_tpu.config import CfgNode, configurable, downgrade_config, get_cfg, upgrade_config

_V0_CFG = """
MODEL:
  RPN_HEAD:
    NAME: "TEST"
VERSION: 0
"""

_V1_CFG = """
MODEL:
  WEIGHT: "/path/to/weight"
"""


class TestConfigVersioning:
    def test_upgrade_downgrade_consistency(self):
        cfg = get_cfg()
        # check that custom is preserved
        cfg.USER_CUSTOM = 1

        down = downgrade_config(cfg, to_version=0)
        up = upgrade_config(down)
        assert up == cfg

    def _merge_cfg_str(self, cfg, merge_str):
        f = tempfile.NamedTemporaryFile(mode="w", suffix=".yaml", delete=False)
        try:
            f.write(merge_str)
            f.close()
            cfg.merge_from_file(f.name)
        finally:
            os.remove(f.name)
        return cfg

    def test_auto_upgrade(self):
        cfg = get_cfg()
        latest_ver = cfg.VERSION
        cfg.USER_CUSTOM = 1

        self._merge_cfg_str(cfg, _V0_CFG)

        assert cfg.MODEL.RPN.HEAD_NAME == "TEST"
        assert cfg.VERSION == latest_ver

    def test_guess_v1(self):
        cfg = get_cfg()
        latest_ver = cfg.VERSION
        self._merge_cfg_str(cfg, _V1_CFG)
        assert cfg.VERSION == latest_ver


class _TestClassA:
    @configurable
    def __init__(self, arg1, arg2, arg3=3):
        self.arg1 = arg1
        self.arg2 = arg2
        self.arg3 = arg3

    @classmethod
    def from_config(cls, cfg):
        args = {"arg1": cfg.ARG1, "arg2": cfg.ARG2}
        return args


class _TestClassB(_TestClassA):
    @configurable
    def __init__(self, input_shape, arg1, arg2, arg3=3):
        """Doc of _TestClassB"""
        assert input_shape == "shape"
        super().__init__(arg1, arg2, arg3)

    @classmethod
    def from_config(cls, cfg, input_shape):  # test extra positional arg in from_config
        args = {"arg1": cfg.ARG1, "arg2": cfg.ARG2}
        args["input_shape"] = input_shape
        return args


class _LegacySubClass(_TestClassB):
    # an old subclass written in cfg style
    def __init__(self, cfg, input_shape, arg4=4):
        super().__init__(cfg, input_shape)
        assert self.arg1 == 1
        assert self.arg2 == 2
        assert self.arg3 == 3


class _NewSubClassNewInit(_TestClassB):
    # test new subclass with a new __init__
    @configurable
    def __init__(self, input_shape, arg4=4, **kwargs):
        super().__init__(input_shape, **kwargs)
        assert self.arg1 == 1
        assert self.arg2 == 2
        assert self.arg3 == 3


class _LegacySubClassNotCfg(_TestClassB):
    # test the subclass that doesn't take "cfg" (not config-dependent)
    def __init__(self, input_shape):
        super().__init__(input_shape, arg1=1, arg2=2)
        assert self.arg1 == 1
        assert self.arg2 == 2
        assert self.arg3 == 3


class _TestFunctionHolder:
    @staticmethod
    @configurable(from_config=lambda cfg, arg2: {"arg1": cfg.ARG1, "arg2": arg2, "arg3": cfg.ARG3})
    def testfunc(arg1, arg2=2, arg3=3):
        return arg1, arg2, arg3


class TestConfigurable:
    def _get_cfg(self):
        cfg = CfgNode()
        cfg.ARG1 = 1
        cfg.ARG2 = 2
        cfg.ARG3 = 3
        return cfg

    def test_configurable_basic(self):
        cfg = self._get_cfg()
        obj = _TestClassA(cfg)
        assert (obj.arg1, obj.arg2, obj.arg3) == (1, 2, 3)

        obj = _TestClassA(cfg, arg3=4)
        assert obj.arg3 == 4

        obj = _TestClassA(arg1=1, arg2=10)
        assert obj.arg2 == 10

    def test_configurable_extra_positional(self):
        cfg = self._get_cfg()
        obj = _TestClassB(cfg, "shape")
        assert (obj.arg1, obj.arg2) == (1, 2)

    def test_legacy_subclasses(self):
        cfg = self._get_cfg()
        _LegacySubClass(cfg, "shape")
        _NewSubClassNewInit(cfg, "shape")
        _LegacySubClassNotCfg("shape")

    def test_configurable_function(self):
        cfg = self._get_cfg()
        r = _TestFunctionHolder.testfunc(cfg, arg2=20)
        assert r == (1, 20, 3)

        r = _TestFunctionHolder.testfunc(100, 200, 300)
        assert r == (100, 200, 300)


class TestCfgNode:
    def test_merge_from_list(self):
        cfg = get_cfg()
        cfg.merge_from_list(["MODEL.MASK_ON", "True", "SOLVER.BASE_LR", "0.02"])
        assert cfg.MODEL.MASK_ON is True
        assert cfg.SOLVER.BASE_LR == 0.02

    def test_merge_nonexistent_raises(self):
        cfg = get_cfg()
        with pytest.raises(Exception):
            cfg.merge_from_list(["MODEL.NON_EXISTENT", "True"])

    def test_freeze(self):
        cfg = get_cfg()
        cfg.freeze()
        with pytest.raises(AttributeError):
            cfg.MODEL.MASK_ON = True
        cfg.defrost()
        cfg.MODEL.MASK_ON = True

    def test_base_inheritance(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("MODEL:\n  MASK_ON: True\n  RESNETS:\n    DEPTH: 101\n")
        child = tmp_path / "child.yaml"
        child.write_text(f'_BASE_: "{base}"\nMODEL:\n  RESNETS:\n    DEPTH: 50\n')
        cfg = get_cfg()
        cfg.merge_from_file(str(child))
        assert cfg.MODEL.MASK_ON is True
        assert cfg.MODEL.RESNETS.DEPTH == 50

    def test_dump_and_reload(self):
        cfg = get_cfg()
        cfg.MODEL.MASK_ON = True
        s = cfg.dump()
        cfg2 = CfgNode.load_cfg(s)
        assert cfg2.MODEL.MASK_ON is True
        assert cfg2.SOLVER.BASE_LR == cfg.SOLVER.BASE_LR

    def test_type_coercion(self):
        cfg = get_cfg()
        # tuple default can be merged from list value
        cfg.merge_from_list(["SOLVER.STEPS", "(100, 200)"])
        assert cfg.SOLVER.STEPS == (100, 200)
