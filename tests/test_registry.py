"""Registry + locate semantics (reference tests/test_registry.py)."""

import pytest

from detectron2_tpu.modeling import GeneralizedRCNN
from detectron2_tpu.utils.registry import Registry, _convert_target_to_string, locate


def test_registry_register_and_get():
    reg = Registry("test_reg")

    @reg.register()
    class Thing:
        pass

    def builder():
        return 42

    reg.register(builder)
    assert reg.get("Thing") is Thing
    assert reg.get("builder") is builder
    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(ValueError, match="already registered"):
        reg.register(Thing)  # duplicate name


def test_locate_dotted_names():
    assert locate("detectron2_tpu.modeling.GeneralizedRCNN") is GeneralizedRCNN
    # attribute chains below a module resolve too
    fn = locate("detectron2_tpu.modeling.GeneralizedRCNN.from_config")
    assert callable(fn)


def test_convert_target_roundtrip():
    name = _convert_target_to_string(GeneralizedRCNN)
    assert locate(name) is GeneralizedRCNN
    import detectron2_tpu.data.transforms as T

    name = _convert_target_to_string(T.ResizeShortestEdge)
    assert locate(name) is T.ResizeShortestEdge
