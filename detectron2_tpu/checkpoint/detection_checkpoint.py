"""Checkpointing: save/load params + optimizer state + trainer state, and
ingest detectron2 zoo .pkl weights.

Parity with reference detectron2/checkpoint/detection_checkpoint.py:16-143 +
fvcore Checkpointer: the "last_checkpoint" file convention, resume_or_load,
periodic saves. Native format is msgpack via flax.serialization (a single
self-describing file; multi-host safe since state is replicated and only the
main process writes).
"""

import logging
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

import jax
from flax import serialization

from detectron2_tpu.checkpoint.d2_converter import convert_d2_state_dict
from detectron2_tpu.utils import comm
from detectron2_tpu.utils.file_io import PathManager

__all__ = ["Checkpointer", "DetectionCheckpointer", "PeriodicCheckpointer"]

logger = logging.getLogger(__name__)


class Checkpointer:
    """Save/load model params and extra checkpointables."""

    def __init__(self, params, save_dir: str = "", *, save_to_disk: Optional[bool] = None, **checkpointables):
        """
        Args:
            params: the parameter pytree (or a holder object with .params).
            save_dir: directory for checkpoints.
            checkpointables: extra objects with state_dict/load_state_dict, or
                raw pytrees.
        """
        self.params = params
        self.save_dir = save_dir
        self.save_to_disk = comm.is_main_process() if save_to_disk is None else save_to_disk
        self.checkpointables = dict(checkpointables)
        self.path_manager = PathManager

    def _get_state(self) -> Dict[str, Any]:
        data = {"model": serialization.to_bytes(self.params)}
        for key, obj in self.checkpointables.items():
            if hasattr(obj, "state_dict"):
                data[key] = obj.state_dict()
            else:
                data[key] = serialization.to_bytes(obj)
        return data

    def save(self, name: str, **kwargs) -> None:
        if not self.save_dir or not self.save_to_disk:
            return
        data = self._get_state()
        data.update(kwargs)
        basename = f"{name}.ckpt"
        save_file = os.path.join(self.save_dir, basename)
        os.makedirs(self.save_dir, exist_ok=True)
        logger.info("Saving checkpoint to {}".format(save_file))
        with open(save_file, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        self.tag_last_checkpoint(basename)

    def load(self, path: str, checkpointables: Optional[List[str]] = None) -> Dict[str, Any]:
        """Load from path; returns extra data in the checkpoint. Mutates
        self.params in place (pytree leaves replaced)."""
        if not path:
            logger.info("No checkpoint given; model stays randomly initialized.")
            return {}
        path = self.path_manager.get_local_path(path)
        assert os.path.isfile(path), f"Checkpoint {path} not found!"
        logger.info("Loading checkpoint from {}".format(path))

        if path.endswith(".pkl"):
            # detectron2 / Caffe2 zoo format
            with open(path, "rb") as f:
                data = pickle.load(f, encoding="latin1")
            state_dict = data.get("model", data)
            # When holding a TrainState (DefaultTrainer), convert into the
            # model-variables subtree only — opt_state/step must not be fed
            # through the name mapper — and write it back via .replace.
            holder = self.params
            if hasattr(holder, "params") and hasattr(holder, "replace"):
                new_vars, report = convert_d2_state_dict(state_dict, holder.params)
                self.params = holder.replace(params=new_vars)
            else:
                self.params, report = convert_d2_state_dict(state_dict, holder)
            logger.info(report)
            self.last_report = report
            if report.startswith("Loaded 0/"):
                raise RuntimeError(
                    f"d2 checkpoint {path} matched 0 parameter tensors — the "
                    f"name mapping failed; refusing to train from random init.\n{report}"
                )
            return {}

        with open(path, "rb") as f:
            data = pickle.load(f)
        self.params = serialization.from_bytes(self.params, data.pop("model"))
        for key in list(self.checkpointables.keys() if checkpointables is None else checkpointables):
            if key in data:
                obj = self.checkpointables[key]
                if hasattr(obj, "load_state_dict"):
                    obj.load_state_dict(data.pop(key))
                else:
                    self.checkpointables[key] = serialization.from_bytes(obj, data.pop(key))
        return data

    def has_checkpoint(self) -> bool:
        save_file = os.path.join(self.save_dir, "last_checkpoint")
        return os.path.exists(save_file)

    def get_checkpoint_file(self) -> str:
        save_file = os.path.join(self.save_dir, "last_checkpoint")
        try:
            with open(save_file, "r") as f:
                last_saved = f.read().strip()
        except IOError:
            return ""
        return os.path.join(self.save_dir, last_saved)

    def get_all_checkpoint_files(self) -> List[str]:
        return [
            os.path.join(self.save_dir, f)
            for f in os.listdir(self.save_dir)
            if os.path.isfile(os.path.join(self.save_dir, f)) and f.endswith(".ckpt")
        ]

    def resume_or_load(self, path: str, *, resume: bool = True) -> Dict[str, Any]:
        """If resume and a checkpoint exists, load the latest (including
        trainer state); otherwise load `path` as initial weights only
        (reference defaults.py:432-450 semantics)."""
        if resume and self.has_checkpoint():
            path = self.get_checkpoint_file()
            return self.load(path)
        return self.load(path, checkpointables=[])

    def tag_last_checkpoint(self, last_filename_basename: str) -> None:
        save_file = os.path.join(self.save_dir, "last_checkpoint")
        with open(save_file, "w") as f:
            f.write(last_filename_basename)


class DetectionCheckpointer(Checkpointer):
    """Checkpointer that additionally understands detectron2 zoo formats
    (.pkl Caffe2/d2, reference detection_checkpoint.py:70-124). With multiple
    host processes, only the main process touches the filesystem; loaded
    params are identical everywhere because loading is deterministic."""

    def __init__(self, params, save_dir: str = "", *, save_to_disk=None, **checkpointables):
        super().__init__(params, save_dir, save_to_disk=save_to_disk, **checkpointables)


class PeriodicCheckpointer:
    """Save checkpoints periodically (fvcore PeriodicCheckpointer semantics;
    driven by the hook of the same name)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: Optional[int] = None, max_to_keep: Optional[int] = None, file_prefix: str = "model"):
        self.checkpointer = checkpointer
        self.period = int(period)
        self.max_iter = max_iter
        self.max_to_keep = max_to_keep
        self.recent_checkpoints: List[str] = []
        self.file_prefix = file_prefix

    def step(self, iteration: int, **kwargs) -> None:
        iteration = int(iteration)
        additional_state = {"iteration": iteration}
        additional_state.update(kwargs)
        if (iteration + 1) % self.period == 0:
            self.checkpointer.save(f"{self.file_prefix}_{iteration:07d}", **additional_state)
            if self.max_to_keep is not None:
                self.recent_checkpoints.append(self.checkpointer.get_checkpoint_file())
                if len(self.recent_checkpoints) > self.max_to_keep:
                    file_to_delete = self.recent_checkpoints.pop(0)
                    if os.path.exists(file_to_delete) and not file_to_delete.endswith(
                        f"{self.file_prefix}_final.ckpt"
                    ):
                        os.remove(file_to_delete)
        if self.max_iter is not None and iteration >= self.max_iter - 1:
            self.checkpointer.save(f"{self.file_prefix}_final", **additional_state)

    def save(self, name: str, **kwargs) -> None:
        self.checkpointer.save(name, **kwargs)
