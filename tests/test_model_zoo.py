"""Model zoo API tests (analogue of reference tests/test_model_zoo.py)."""

import pytest

from detectron2_tpu import model_zoo
from detectron2_tpu.config import CfgNode
from detectron2_tpu.model_zoo.model_zoo import _ModelZooUrls


def test_every_url_entry_has_a_config_file():
    missing = []
    for name in _ModelZooUrls.CONFIG_PATH_TO_URL_SUFFIX:
        for ext in (".yaml", ".py"):
            try:
                model_zoo.get_config_file(name + ext)
                break
            except RuntimeError:
                continue
        else:
            missing.append(name)
    assert not missing, f"URL-table entries without a config file: {missing}"


def test_get_checkpoint_url():
    url = model_zoo.get_checkpoint_url("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml")
    assert url.startswith("https://dl.fbaipublicfiles.com/detectron2/")
    assert url.endswith(".pkl")
    with pytest.raises(RuntimeError):
        model_zoo.get_checkpoint_url("not/a/config.yaml")


def test_get_config_yacs():
    cfg = model_zoo.get_config("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml")
    assert isinstance(cfg, CfgNode)
    assert cfg.MODEL.MASK_ON and cfg.MODEL.RESNETS.DEPTH == 50
    cfg_t = model_zoo.get_config(
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml", trained=True
    )
    assert cfg_t.MODEL.WEIGHTS.endswith("model_final_f10217.pkl")


def test_get_config_lazy():
    cfg = model_zoo.get_config("new_baselines/mask_rcnn_R_50_FPN_100ep_LSJ.py")
    assert "model" in cfg and "dataloader" in cfg and "lr_multiplier" in cfg
    cfg_t = model_zoo.get_config("new_baselines/mask_rcnn_R_50_FPN_100ep_LSJ.py", trained=True)
    assert cfg_t.train["init_checkpoint"].endswith(".pkl")
