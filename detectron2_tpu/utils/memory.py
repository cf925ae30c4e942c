"""Memory management utilities.

The reference's ``retry_if_cuda_oom`` (detectron2/utils/memory.py:26-85)
retries an op after emptying the CUDA cache, then falls back to CPU. On TPU
the equivalent escape hatches are different: XLA preallocates HBM and OOM is a
compile/alloc-time event, so the fallback ladder is (1) clear jax caches and
live buffers we can drop, (2) rerun the function on the CPU backend.
"""

import functools
import logging
from contextlib import contextmanager

import jax

__all__ = ["retry_if_hbm_oom", "retry_if_cuda_oom"]


@contextmanager
def _ignore_oom():
    try:
        yield
    except Exception as e:
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            pass
        else:
            raise


def retry_if_hbm_oom(func):
    """Makes ``func`` retry on TPU HBM OOM: first after clearing jax's
    compilation/array caches, then on the CPU backend.

    Usage mirrors the reference's ``retry_if_cuda_oom``::

        output = retry_if_hbm_oom(some_jax_function)(input1, input2)
    """

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        with _ignore_oom():
            return func(*args, **kwargs)

        # Attempt after clearing caches
        jax.clear_caches()
        with _ignore_oom():
            return func(*args, **kwargs)

        logger = logging.getLogger(__name__)
        logger.info("Attempting to run %s on CPU due to HBM OOM", str(func))
        cpu = jax.devices("cpu")[0]
        moved_args = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu) if hasattr(x, "devices") else x, args
        )
        moved_kwargs = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu) if hasattr(x, "devices") else x, kwargs
        )
        with jax.default_device(cpu):
            return func(*moved_args, **moved_kwargs)

    return wrapped


# API-parity alias: code ported from the reference may call the CUDA name.
retry_if_cuda_oom = retry_if_hbm_oom
