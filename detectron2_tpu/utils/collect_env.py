"""Environment report (reference detectron2/utils/collect_env.py)."""

import os
import sys
from collections import OrderedDict

__all__ = ["collect_env_info"]


def collect_env_info() -> str:
    import numpy as np

    data = []
    data.append(("sys.platform", sys.platform))
    data.append(("Python", sys.version.replace("\n", "")))
    data.append(("numpy", np.__version__))

    try:
        import detectron2_tpu

        data.append(("detectron2_tpu", detectron2_tpu.__version__ + " @ " + os.path.dirname(detectron2_tpu.__file__)))
    except ImportError:
        data.append(("detectron2_tpu", "failed to import"))

    try:
        import jax

        data.append(("jax", jax.__version__))
        data.append(("jax backend", jax.default_backend()))
        data.append(("devices", str(jax.devices())))
    except Exception as e:
        data.append(("jax", f"error: {e}"))

    for mod in ["flax", "optax", "orbax.checkpoint", "cv2", "PIL"]:
        try:
            import importlib

            m = importlib.import_module(mod)
            data.append((mod, getattr(m, "__version__", "unknown")))
        except ImportError:
            data.append((mod, "not installed"))

    env_str = "\n".join(f"{k:<30} {v}" for k, v in data)
    return env_str


if __name__ == "__main__":
    print(collect_env_info())
