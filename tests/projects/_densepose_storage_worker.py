"""Rank entrypoint for tests/projects/test_densepose_storage.py.

Run as: python tests/projects/_densepose_storage_worker.py <rank> <world>
        <coordinator> <outdir>

Two real processes evaluate the synthetic DensePose scenario with each rank
holding half the detections, once through the plain object-gather path
(storage=None) and once through the file-backed spool
(DENSEPOSE_EVALUATION.STORAGE analogue): the stats must be identical —
proving the spool changes where bytes live, not what the engine computes —
and the spool path's predictions list must hold only refs (no arrays), the
memory-bounding property.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _grouped_gts(cases):
    by_img = {}
    for g in cases["gts"]:
        by_img.setdefault(g["image_id"], []).append(dict(g))
    return by_img


def _run_eval(cases, table_kw, storage, outdir):
    import numpy as np  # noqa: F401

    from detectron2_tpu.data import MetadataCatalog
    from detectron2_tpu.projects.densepose import GeodesicMeshTables
    from detectron2_tpu.projects.densepose.evaluation import DensePoseCOCOEvaluator
    from detectron2_tpu.utils import comm

    MetadataCatalog.get("dp_storage_test")
    ev = DensePoseCOCOEvaluator(
        "dp_storage_test",
        GeodesicMeshTables(**table_kw),
        mode="gpsm",
        storage=storage,
    )
    ev.set_ground_truth(_grouped_gts(cases), image_sizes=dict(cases["image_sizes"]))
    ev.reset()
    # disjoint halves: rank r processes detections r::world, grouped by image
    rank, world = comm.get_rank(), comm.get_world_size()
    mine = {}
    for i, d in enumerate(cases["dts"]):
        if i % world == rank:
            d = dict(d)
            d["densepose"] = d.pop("densepose_iuv")
            mine.setdefault(d["image_id"], []).append(d)
    ev.process(None, [{"image_id": k, "instances": v} for k, v in mine.items()])
    if storage is not None:
        import detectron2_tpu.projects.densepose.tensor_storage as ts

        refs = [
            d["densepose"]
            for rec in ev._predictions
            for d in rec["instances"]
        ]
        assert refs and all(isinstance(r, ts.BlobRef) for r in refs), (
            "spool path must keep only BlobRefs in the predictions list"
        )
    return ev.evaluate()


def _main(outdir: str, world: int, rank: int):
    from detectron2_tpu.projects.densepose.tensor_storage import (
        build_densepose_evaluator_storage,
    )
    from detectron2_tpu.utils import comm

    from densepose_eval_synth import make_cases, make_mesh_tables

    cases, table_kw = make_cases(), make_mesh_tables()

    res_plain = _run_eval(cases, table_kw, None, outdir)
    spool = build_densepose_evaluator_storage("file", outdir)
    res_spool = _run_eval(cases, table_kw, spool, outdir)

    if comm.is_main_process():
        assert res_plain is not None and res_spool is not None
        a = res_plain["densepose_gpsm"]
        b = res_spool["densepose_gpsm"]
        assert a == b, (a, b)
        assert a["AP"] > 0.1, a  # non-degenerate scenario
        spool_file = os.path.join(outdir, "densepose_eval", "densepose_eval_spool_rank1.bin")
        assert os.path.exists(spool_file) and os.path.getsize(spool_file) > 0
        with open(os.path.join(outdir, "rank0_result.json"), "w") as f:
            json.dump({"plain": a, "spool": b}, f)
    comm.synchronize("done")


def run():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

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
