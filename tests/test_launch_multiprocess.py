"""Two real localhost processes through engine/launch.py +
jax.distributed.initialize: the multi-process branches of utils/comm.py
(all_gather/gather/reduce_dict/shared_random_seed/synchronize), the
InferenceSampler exact partition, and rank-0-only checkpoint writing — all of
which degenerate to identity at world size 1 and were otherwise dead code.

Reference analogue: detectron2/engine/launch.py:27-123 (mp.spawn + NCCL
rendezvous) and utils/comm.py:138-192; JAX is single-controller, so the
framework's launch() initializes jax.distributed per host process instead of
forking per GPU.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_launch_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_launch(tmp_path):
    world = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # extend, never override: /root/.axon_site must stay importable
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), str(world), coordinator, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for rank in range(world)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    results = {}
    for rank in range(world):
        with open(tmp_path / f"rank{rank}.json") as f:
            results[rank] = json.load(f)

    for rank, res in results.items():
        assert res["world_size"] == world
        assert res["rank"] == rank
        assert res["is_main"] == (rank == 0)
        # 2 local CPU devices per process, globally visible to both
        assert res["n_devices_local"] == 2
        assert res["n_devices_global"] == 4

        # all_gather is ordered by rank and carries variable-size payloads
        blobs = res["all_gather"]
        assert [b["rank"] for b in blobs] == [0, 1]
        assert [len(b["blob"]) for b in blobs] == [17, 1017]

        # gather returns data only on dst, [] elsewhere (reference comm.py:163)
        assert res["gather_dst0"] == ([{"r": 0}, {"r": 1}] if rank == 0 else [])
        assert res["gather_dst1"] == ([{"r": 0}, {"r": 1}] if rank == 1 else [])

        assert res["reduce_avg"] == {"v": 1.5}
        assert res["reduce_sum"] == {"v": 3.0}

    # one shared seed on every rank (rank 0's draw)
    assert results[0]["shared_seed"] == results[1]["shared_seed"]

    # InferenceSampler(11): exact, disjoint, order-preserving partition
    assert results[0]["sampler_indices"] == list(range(0, 6))
    assert results[1]["sampler_indices"] == list(range(6, 11))

    # the checkpoint was written exactly once, by rank 0
    assert results[0]["ckpt_exists"] and results[1]["ckpt_exists"]
    assert (tmp_path / "last_checkpoint").exists()
