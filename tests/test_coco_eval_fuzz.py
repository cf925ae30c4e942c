"""COCOeval fuzz: the python greedy matcher and the native C++ matcher are
independent implementations of the pycocotools evaluateImg contract — on
randomized datasets (crowd anns, area-range buckets, many categories, score
ties) all 12 summary metrics must agree bit-for-bit. This pins the
crowd/ignore/area-range edge cases the analytic tests (test_coco_eval.py)
don't reach."""

import numpy as np
import pytest

from detectron2_tpu.evaluation import _native
from detectron2_tpu.evaluation.coco_eval_np import COCOStyleDataset, COCOevalNP


def _random_dataset(seed, n_images=8, n_cats=5, crowd_frac=0.15):
    rng = np.random.RandomState(seed)
    images = [{"id": i, "height": 480, "width": 640} for i in range(n_images)]
    categories = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns = []
    aid = 1
    for i in range(n_images):
        for _ in range(rng.randint(0, 12)):
            # sizes spanning the small/medium/large area buckets
            w = float(rng.choice([8, 24, 64, 180])) * (0.5 + rng.rand())
            h = float(rng.choice([8, 24, 64, 180])) * (0.5 + rng.rand())
            x = rng.rand() * (640 - w)
            y = rng.rand() * (480 - h)
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(rng.randint(1, n_cats + 1)),
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "iscrowd": int(rng.rand() < crowd_frac),
                }
            )
            aid += 1
    return {"images": images, "annotations": anns, "categories": categories}


def _random_detections(gt, seed, noise=10.0, miss_p=0.25, fp_per_img=4):
    rng = np.random.RandomState(seed + 1000)
    dets = []
    for ann in gt["annotations"]:
        if rng.rand() < miss_p:
            continue
        x, y, w, h = ann["bbox"]
        dets.append(
            {
                "image_id": ann["image_id"],
                "category_id": ann["category_id"]
                if rng.rand() > 0.1
                else int(rng.randint(1, 6)),
                "bbox": [
                    x + rng.randn() * noise,
                    y + rng.randn() * noise,
                    max(w + rng.randn() * noise, 2),
                    max(h + rng.randn() * noise, 2),
                ],
                # quantized scores -> deliberate ties
                "score": round(float(rng.rand()), 2),
            }
        )
    for img in gt["images"]:
        for _ in range(rng.randint(0, fp_per_img)):
            dets.append(
                {
                    "image_id": img["id"],
                    "category_id": int(rng.randint(1, 6)),
                    "bbox": [rng.rand() * 500, rng.rand() * 400, rng.rand() * 100 + 4, rng.rand() * 100 + 4],
                    "score": round(float(rng.rand()), 2),
                }
            )
    return dets


def _run_eval(gt, dets, use_native):
    coco_gt = COCOStyleDataset(gt)
    coco_dt = coco_gt.loadRes(dets)
    ev = COCOevalNP(coco_gt, coco_dt, iouType="bbox")
    if not use_native:
        # force the pure-python matcher
        orig = _native.native_evaluate_img
        _native_disabled = lambda *a, **k: None
        try:
            import detectron2_tpu.evaluation._native as nat

            nat_fn = nat.native_evaluate_img
            nat.native_evaluate_img = _native_disabled
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
        finally:
            nat.native_evaluate_img = nat_fn
    else:
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    return np.asarray(ev.stats)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_python_matcher(seed):
    if _native.get_lib() is None:
        pytest.skip("native cocoeval lib unavailable")
    gt = _random_dataset(seed)
    dets = _random_detections(gt, seed)
    if not dets:
        pytest.skip("degenerate draw")
    s_py = _run_eval(gt, dets, use_native=False)
    s_nat = _run_eval(gt, dets, use_native=True)
    np.testing.assert_allclose(s_py, s_nat, atol=1e-12, err_msg=f"seed {seed}")


def test_crowd_heavy_dataset():
    if _native.get_lib() is None:
        pytest.skip("native cocoeval lib unavailable")
    gt = _random_dataset(99, crowd_frac=0.6)
    dets = _random_detections(gt, 99, noise=4.0, miss_p=0.1)
    s_py = _run_eval(gt, dets, use_native=False)
    s_nat = _run_eval(gt, dets, use_native=True)
    np.testing.assert_allclose(s_py, s_nat, atol=1e-12)


# --------------------------------------------------------------------------
# Goldens derived from the REFERENCE detectron2's real C++ COCOeval
# (layers/csrc/cocoeval/cocoeval.cpp compiled as a torch CPU extension and
# driven per fast_eval_api.py; see dev/make_cocoeval_reference_goldens.py).
# IoUs on the oracle side came from independent implementations (bbox w/
# crowd, dense-mask IoU, OKS), so these cases pin computeIoU, the RLE codec,
# OKS, the matcher, and accumulate against upstream — not self-referentially.

import json
import os

_REF_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "cocoeval_reference.npz")


def _load_ref_cases():
    data = np.load(_REF_GOLDENS)
    names = sorted({k.split("/")[0] for k in data.files})
    return data, names


_REF_DATA, _REF_CASES = _load_ref_cases()


def _json_of(arr):
    return json.loads(bytes(arr.tobytes()).decode())


@pytest.mark.parametrize("name", _REF_CASES)
@pytest.mark.parametrize("matcher", ["native", "python"])
def test_matches_reference_cpp_goldens(name, matcher):
    if matcher == "native" and _native.get_lib() is None:
        pytest.skip("native cocoeval lib unavailable")
    gt = _json_of(_REF_DATA[f"{name}/gt"])
    dets = _json_of(_REF_DATA[f"{name}/dt"])
    meta = _json_of(_REF_DATA[f"{name}/meta"])

    coco_gt = COCOStyleDataset(gt)
    coco_dt = coco_gt.loadRes(dets)
    ev = COCOevalNP(coco_gt, coco_dt, iouType=meta["iou_type"])
    ev.params.useCats = meta["use_cats"]

    import detectron2_tpu.evaluation._native as nat

    nat_fn = nat.native_evaluate_img
    if matcher == "python":
        nat.native_evaluate_img = lambda *a, **k: None
    try:
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    finally:
        nat.native_evaluate_img = nat_fn

    np.testing.assert_allclose(
        ev.eval["precision"], _REF_DATA[f"{name}/precision"], atol=1e-9, err_msg=name
    )
    np.testing.assert_allclose(
        ev.eval["recall"], _REF_DATA[f"{name}/recall"], atol=1e-9, err_msg=name
    )
    np.testing.assert_allclose(
        ev.eval["scores"], _REF_DATA[f"{name}/scores"], atol=1e-9, err_msg=name
    )
