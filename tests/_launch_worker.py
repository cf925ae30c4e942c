"""Rank entrypoint for tests/test_launch_multiprocess.py.

Run as: python tests/_launch_worker.py <rank> <world> <coordinator> <outdir>

Each subprocess goes through engine/launch.py -> jax.distributed.initialize
(the reference's launch.py:27-123 tcp:// rendezvous analogue) and exercises
every multi-process branch of utils/comm.py that degenerates to identity at
world size 1, plus the InferenceSampler partition and rank-0-only checkpoint
writing. Results are dumped as one json per rank for the parent to assert.
"""

import json
import os
import sys


def _main(outdir: str, world: int, rank: int):
    import numpy as np

    import jax

    from detectron2_tpu.checkpoint import DetectionCheckpointer
    from detectron2_tpu.data.samplers import InferenceSampler
    from detectron2_tpu.utils import comm

    res = {
        "world_size": comm.get_world_size(),
        "rank": comm.get_rank(),
        "is_main": comm.is_main_process(),
        "n_devices_global": len(jax.devices()),
        "n_devices_local": jax.local_device_count(),
    }
    comm.synchronize("worker_start")

    # variable-length picklable payloads exercise the padded uint8 transport
    obj = {"rank": rank, "blob": "x" * (17 + 1000 * rank)}
    res["all_gather"] = comm.all_gather(obj)
    res["gather_dst0"] = comm.gather({"r": rank}, dst=0)
    res["gather_dst1"] = comm.gather({"r": rank}, dst=1)
    res["reduce_avg"] = comm.reduce_dict({"v": float(rank + 1)}, average=True)
    res["reduce_sum"] = comm.reduce_dict({"v": float(rank + 1)}, average=False)
    res["shared_seed"] = comm.shared_random_seed()
    res["sampler_indices"] = [int(i) for i in InferenceSampler(11)]

    # rank-0-only checkpointing (save_to_disk defaults to is_main_process)
    ckpt = DetectionCheckpointer({"w": np.full((3,), float(rank), np.float32)}, save_dir=outdir)
    ckpt.save("multiproc_test")
    comm.synchronize("after_ckpt")
    res["ckpt_exists"] = os.path.exists(os.path.join(outdir, "multiproc_test.ckpt"))

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(res, f)


def run():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    import jax

    # the .pth hook already imported jax; backends are still uninitialized,
    # so forcing the platform through jax.config works (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from detectron2_tpu.engine.launch import launch

    launch(
        _main,
        num_machines=world,
        machine_rank=rank,
        dist_url=f"tcp://{coordinator}",
        args=(outdir, world, rank),
    )


if __name__ == "__main__":
    run()
