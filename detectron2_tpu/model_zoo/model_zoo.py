"""Model zoo API (reference detectron2/model_zoo/model_zoo.py).

``get_config_file``/``get_config``/``get`` resolve config paths into the
framework's installed ``configs/`` tree and build models; ``get_checkpoint_url``
maps to the public detectron2 release bucket (weights are converted from the
d2 .pkl format by the checkpointer on load).
"""

import os
from typing import Optional

from detectron2_tpu.checkpoint import DetectionCheckpointer
from detectron2_tpu.config import CfgNode, LazyConfig, get_cfg, instantiate
from detectron2_tpu.modeling import build_model
from detectron2_tpu.utils.file_io import PathManager

__all__ = ["get_checkpoint_url", "get_config_file", "get_config", "get"]


class _ModelZooUrls:
    """Mapping from config path to the released checkpoint suffix
    (reference model_zoo.py:12-110; only models covered by this framework's
    config zoo are listed)."""

    S3_PREFIX = "https://dl.fbaipublicfiles.com/detectron2/"

    CONFIG_PATH_TO_URL_SUFFIX = {
        "COCO-Detection/faster_rcnn_R_50_FPN_1x": "137257794/model_final_b275ba",
        "COCO-Detection/faster_rcnn_R_50_FPN_3x": "137849458/model_final_280758",
        "COCO-Detection/retinanet_R_50_FPN_1x": "190397773/model_final_bfca0b",
        "COCO-Detection/retinanet_R_50_FPN_3x": "190397829/model_final_5bd44e",
        "COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x": "137259246/model_final_9243eb",
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x": "137260431/model_final_a54504",
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x": "137849600/model_final_f10217",
        "COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x": "138205316/model_final_a3ec72",
        "COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x": "137849621/model_final_a6e10b",
        "COCO-PanopticSegmentation/panoptic_fpn_R_50_3x": "139514569/model_final_c10459",
        "COCO-PanopticSegmentation/panoptic_fpn_R_101_3x": "139514519/model_final_cafdb1",
    }

    @staticmethod
    def query(config_path: str) -> Optional[str]:
        name = config_path.replace(".yaml", "").replace(".py", "")
        if name in _ModelZooUrls.CONFIG_PATH_TO_URL_SUFFIX:
            suffix = _ModelZooUrls.CONFIG_PATH_TO_URL_SUFFIX[name]
            return _ModelZooUrls.S3_PREFIX + name + "/" + suffix + ".pkl"
        return None


def get_checkpoint_url(config_path: str) -> str:
    """Returns the URL to the model trained using the given config."""
    url = _ModelZooUrls.query(config_path)
    if url is None:
        raise RuntimeError(f"Pretrained model for {config_path} is not available!")
    return url


def get_config_file(config_path: str) -> str:
    """Returns the real path of the builtin config file."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg_file = os.path.join(here, "configs", config_path)
    if not os.path.exists(cfg_file):
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return cfg_file


def get_config(config_path: str, trained: bool = False):
    """Returns a config object (CfgNode or lazy dict) for the given builtin
    config path; with trained=True, MODEL.WEIGHTS points at the zoo
    checkpoint (reference model_zoo.py:147)."""
    cfg_file = get_config_file(config_path)
    if cfg_file.endswith(".yaml"):
        cfg = get_cfg()
        cfg.merge_from_file(cfg_file)
        if trained:
            cfg.MODEL.WEIGHTS = get_checkpoint_url(config_path)
        return cfg
    elif cfg_file.endswith(".py"):
        cfg = LazyConfig.load(cfg_file)
        if trained:
            url = get_checkpoint_url(config_path)
            if "train" in cfg and "init_checkpoint" in cfg.train:
                cfg.train.init_checkpoint = url
            else:
                raise NotImplementedError
        return cfg


def get(config_path: str, trained: bool = False, device=None):
    """Build + (optionally) load a model from a builtin config
    (reference model_zoo.py:180). Returns (model, params)."""
    import jax
    import numpy as np

    cfg = get_config(config_path, trained)
    if isinstance(cfg, CfgNode):
        model = build_model(cfg)
        dummy = {
            "image": np.zeros((1, 64, 64, 3), np.float32),
            "image_sizes": np.asarray([[64, 64]], np.int32),
        }
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, dummy, train=False
        )
        if trained and cfg.MODEL.WEIGHTS:
            checkpointer = DetectionCheckpointer(params)
            checkpointer.load(cfg.MODEL.WEIGHTS)
            params = checkpointer.params
        return model, params
    else:
        model = instantiate(cfg.model)
        return model, None
