"""Environment setup (reference detectron2/utils/env.py)."""

import importlib
import importlib.util
import os
import random
import sys
from datetime import datetime

import numpy as np

__all__ = ["seed_all_rng", "setup_environment", "TORCH_VERSION"]

# kept for API parity with code that checks it; torch is not used on the
# compute path of this framework.
TORCH_VERSION = ()

_ENV_SETUP_DONE = False


def seed_all_rng(seed=None):
    """Set the seed for the host RNGs (python.random and numpy).

    Reference detectron2/utils/env.py:27. Device-side randomness in this
    framework is handled with explicit ``jax.random`` keys threaded through
    step functions, so there is no global device RNG to seed.

    Returns:
        the seed used.
    """
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
    np.random.seed(seed % (2**32))
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def _import_file(module_name, file_path, make_importable=False):
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if make_importable:
        sys.modules[module_name] = module
    return module


def setup_environment():
    """Perform environment setup (reference env.py:98). Allows a custom hook
    via $DETECTRON2_ENV_MODULE."""
    global _ENV_SETUP_DONE
    if _ENV_SETUP_DONE:
        return
    _ENV_SETUP_DONE = True

    custom_module_path = os.environ.get("DETECTRON2_ENV_MODULE")
    if custom_module_path:
        setup_custom_environment(custom_module_path)


def setup_custom_environment(custom_module):
    """Load custom environment setup from a module or file path and run its
    ``setup_environment`` function."""
    if custom_module.endswith(".py"):
        module = _import_file("detectron2_tpu.utils.env.custom_module", custom_module)
    else:
        module = importlib.import_module(custom_module)
    assert hasattr(module, "setup_environment") and callable(module.setup_environment)
    module.setup_environment()


def fixup_module_metadata(module_name, namespace, keys=None):
    """No-op stub kept for parity."""
    pass
