"""DensePose eval prediction storage (tensor_storage.py): the spool must be
invisible to the metrics (identical stats with storage none/ram/file) while
bounding memory (predictions hold BlobRefs, arrays are read back one at a
time). Reference analogue:
projects/DensePose/densepose/evaluation/tensor_storage.py:1-239 behind
DENSEPOSE_EVALUATION.STORAGE.

Single-process parity runs inline; the two-process file-spool run goes
through real localhost processes + jax.distributed (same harness as
tests/test_launch_multiprocess.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from densepose_eval_synth import make_cases, make_mesh_tables  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_WORKER = os.path.join(_REPO, "tests", "projects", "_densepose_storage_worker.py")


def _grouped_gts(cases):
    by_img = {}
    for g in cases["gts"]:
        by_img.setdefault(g["image_id"], []).append(dict(g))
    return by_img


def _eval_with(storage, tmp_path):
    from detectron2_tpu.data import MetadataCatalog
    from detectron2_tpu.projects.densepose import GeodesicMeshTables
    from detectron2_tpu.projects.densepose.evaluation import DensePoseCOCOEvaluator
    from detectron2_tpu.projects.densepose.tensor_storage import (
        build_densepose_evaluator_storage,
    )

    cases, table_kw = make_cases(), make_mesh_tables()
    MetadataCatalog.get("dp_storage_sp_test")
    spool = build_densepose_evaluator_storage(storage, str(tmp_path))
    ev = DensePoseCOCOEvaluator(
        "dp_storage_sp_test",
        GeodesicMeshTables(**table_kw),
        mode="all",
        storage=spool,
    )
    ev.set_ground_truth(_grouped_gts(cases), image_sizes=dict(cases["image_sizes"]))
    ev.reset()
    by_img = {}
    for d in cases["dts"]:
        d = dict(d)
        d["densepose"] = d.pop("densepose_iuv")
        by_img.setdefault(d["image_id"], []).append(d)
    ev.process(None, [{"image_id": k, "instances": v} for k, v in by_img.items()])
    if spool is not None:
        from detectron2_tpu.projects.densepose.tensor_storage import BlobRef

        refs = [d["densepose"] for rec in ev._predictions for d in rec["instances"]]
        assert refs and all(isinstance(r, BlobRef) for r in refs)
    return ev.evaluate()


def test_spool_invisible_to_metrics(tmp_path):
    base = _eval_with("none", tmp_path)
    for kind in ("ram", "file"):
        res = _eval_with(kind, tmp_path / kind)
        assert res.keys() == base.keys()
        for section in base:
            assert res[section] == base[section], (kind, section)
    # non-degenerate
    assert base["densepose_gps"]["AP"] > 0.1


def test_blob_spool_roundtrip(tmp_path):
    from detectron2_tpu.projects.densepose.tensor_storage import BlobSpool, LazyBlob

    for kind, directory in (("ram", None), ("file", str(tmp_path))):
        spool = BlobSpool(kind, directory)
        rng = np.random.RandomState(0)
        arrays = [
            rng.randint(0, 255, (3, 5 + i, 7 + 2 * i)).astype(np.uint8) for i in range(4)
        ] + [rng.rand(2, 3).astype(np.float32)]
        refs = [spool.put(a) for a in arrays]
        spool.finalize_for_read()  # world size 1: gather is identity
        for a, r in zip(arrays, refs):
            np.testing.assert_array_equal(spool.get(r), a)
            lazy = LazyBlob(spool, r)
            assert lazy.shape == a.shape
            np.testing.assert_array_equal(np.asarray(lazy), a)
            np.testing.assert_array_equal(lazy[0], a[0])
        spool.close()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_file_spool(tmp_path):
    world = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
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

    with open(os.path.join(tmp_path, "rank0_result.json")) as f:
        res = json.load(f)
    assert res["plain"] == res["spool"]
    assert res["plain"]["AP"] > 0.1
