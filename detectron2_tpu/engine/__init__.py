from detectron2_tpu.engine.defaults import (
    DefaultPredictor,
    DefaultTrainer,
    create_ddp_model,
    default_argument_parser,
    default_setup,
    default_writers,
)
from detectron2_tpu.engine.hooks import *  # noqa: F401,F403
from detectron2_tpu.engine.launch import launch
from detectron2_tpu.engine.train_loop import AMPTrainer, HookBase, SimpleTrainer, TrainerBase

__all__ = [k for k in globals().keys() if not k.startswith("_")]
