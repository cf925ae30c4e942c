"""Multi-host launch (reference detectron2/engine/launch.py:27-123).

TPU re-design: the reference spawns one process per GPU and rendezvouses with
NCCL; JAX is single-controller — one process per *host*, all local devices
driven by that process, multi-host coordination via
``jax.distributed.initialize`` over DCN. ``launch`` therefore does not fork:
it initializes the distributed runtime (if multi-machine) and calls main.
"""

import logging
from typing import Any, Callable, Optional, Tuple

__all__ = ["launch", "DEFAULT_TIMEOUT"]

DEFAULT_TIMEOUT = 30 * 60  # seconds, parity with the reference's 30min


def launch(
    main_func: Callable,
    num_gpus_per_machine: int = 0,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: Tuple = (),
    timeout: float = DEFAULT_TIMEOUT,
) -> Any:
    """
    Args:
        main_func: the entry point; called as main_func(*args).
        num_gpus_per_machine: kept for CLI parity; jax uses all local devices.
        num_machines: number of host processes.
        machine_rank: this host's rank.
        dist_url: coordinator address "host:port" for jax.distributed
            (the reference's tcp:// rendezvous analogue).
    """
    logger = logging.getLogger(__name__)
    if num_machines > 1:
        import jax

        coordinator = dist_url or "localhost:12355"
        if coordinator.startswith("tcp://"):
            coordinator = coordinator[len("tcp://") :]
        logger.info(
            "Initializing jax.distributed: coordinator=%s, %d processes, this rank=%d",
            coordinator,
            num_machines,
            machine_rank,
        )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
    return main_func(*args)
