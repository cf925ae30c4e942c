"""Non-COCO evaluator tests: VOC AP (analytic values), SemSeg confusion-matrix
metrics, and voc_ap's 07 vs continuous metric (reference
pascal_voc_evaluation.py:187-280, sem_seg_evaluation.py:36-200)."""

import os

import numpy as np
import pytest

from detectron2_tpu.evaluation.pascal_voc_evaluation import voc_ap, voc_eval


def _write_voc_anno(path, objs):
    body = "".join(
        f"<object><name>{n}</name><difficult>{d}</difficult>"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin><xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox>"
        "</object>"
        for n, d, b in objs
    )
    with open(path, "w") as f:
        f.write(f"<annotation>{body}</annotation>")


@pytest.fixture()
def voc_dir(tmp_path):
    anno = tmp_path / "annos"
    anno.mkdir()
    _write_voc_anno(anno / "img1.xml", [("cat", 0, (10, 10, 50, 50)), ("dog", 0, (60, 60, 90, 90))])
    _write_voc_anno(anno / "img2.xml", [("cat", 0, (20, 20, 40, 40)), ("cat", 1, (70, 70, 90, 90))])
    setfile = tmp_path / "set.txt"
    setfile.write_text("img1\nimg2\n")
    return str(anno / "{}.xml"), str(setfile)


def test_voc_eval_perfect_detections(voc_dir):
    annopath, setfile = voc_dir
    dets = [
        "img1 0.9 10 10 50 50",
        "img2 0.8 20 20 40 40",
    ]
    rec, prec, ap = voc_eval(dets, annopath, setfile, "cat", ovthresh=0.5)
    assert abs(ap - 1.0) < 1e-6
    assert abs(rec[-1] - 1.0) < 1e-6  # 2 non-difficult cat GTs, both found
    assert np.all(prec == 1.0)


def test_voc_eval_difficult_ignored(voc_dir):
    annopath, setfile = voc_dir
    # detecting the difficult GT neither helps recall nor counts as FP
    dets = ["img1 0.9 10 10 50 50", "img2 0.8 20 20 40 40", "img2 0.7 70 70 90 90"]
    _, prec, ap = voc_eval(dets, annopath, setfile, "cat", ovthresh=0.5)
    assert abs(ap - 1.0) < 1e-6
    assert np.all(prec == 1.0)


def test_voc_eval_false_positive_and_miss(voc_dir):
    annopath, setfile = voc_dir
    # one hit (img1), one clean miss of the img2 GT, one FP box
    dets = ["img1 0.9 10 10 50 50", "img2 0.8 100 100 120 120"]
    rec, prec, ap = voc_eval(dets, annopath, setfile, "cat", ovthresh=0.5)
    assert abs(rec[-1] - 0.5) < 1e-6
    np.testing.assert_allclose(prec, [1.0, 0.5])
    # continuous AP: precision envelope 1.0 up to recall 0.5 -> AP = 0.5
    assert abs(ap - 0.5) < 1e-6


def test_voc_ap_07_vs_continuous():
    rec = np.array([0.5])
    prec = np.array([1.0])
    # 11-point metric: mean of max precision at recalls {0, 0.1, ..., 1.0};
    # 6 of 11 points (0..0.5) see precision 1 -> 6/11
    ap07 = voc_ap(np.array([0.0, 0.5]), np.array([1.0, 1.0]), use_07_metric=True)
    assert abs(ap07 - 6.0 / 11.0) < 1e-6
    ap = voc_ap(np.array([0.0, 0.5]), np.array([1.0, 1.0]), use_07_metric=False)
    assert abs(ap - 0.5) < 1e-6


def _register_semseg_dataset(tmp_path, name, gts):
    """gts: dict file stem -> HxW uint8 label map written as png."""
    from PIL import Image

    from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    records = []
    for stem, gt in gts.items():
        img_f = str(tmp_path / f"{stem}.png")
        gt_f = str(tmp_path / f"{stem}_gt.png")
        Image.fromarray(np.zeros_like(gt)).convert("RGB").save(img_f)
        Image.fromarray(gt).save(gt_f)
        records.append(
            {
                "file_name": img_f,
                "sem_seg_file_name": gt_f,
                "height": gt.shape[0],
                "width": gt.shape[1],
            }
        )
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(stuff_classes=["a", "b", "c"], ignore_label=255)
    return records


def _one_hot_logits(labels, num_classes):
    h, w = labels.shape
    logits = np.zeros((h, w, num_classes), np.float32)
    for c in range(num_classes):
        logits[labels == c, c] = 10.0
    return logits


def test_sem_seg_evaluator_exact_miou(tmp_path):
    from detectron2_tpu.evaluation import SemSegEvaluator

    gt = np.zeros((8, 8), np.uint8)
    gt[:, 4:] = 1
    gt[0, 0] = 255  # ignored pixel
    _register_semseg_dataset(tmp_path, "_test_semseg", {"im0": gt})

    ev = SemSegEvaluator("_test_semseg", distributed=False)
    ev.reset()

    # prediction: class 1 correct everywhere; class 0 half misclassified as 2
    pred = gt.copy()
    pred[gt == 255] = 0
    pred[4:, :4] = 2
    inputs = {
        "image_sizes": np.array([[8, 8]]),
        "metadata": [{"file_name": str(tmp_path / "im0.png"), "height": 8, "width": 8}],
    }
    ev.process(inputs, {"sem_seg": _one_hot_logits(pred, 3)[None]})
    res = ev.evaluate()["sem_seg"]

    # class 0: tp=15 (31 gt minus ignored minus 16 stolen... compute directly):
    # gt0 = 31 px (one ignored), pred0 = 15 -> tp = 15, union = 31 -> IoU 15/31
    # class 1: perfect 32 px -> IoU 1
    # class 2: tp=0, pred=16, gt=0 -> IoU 0
    iou0, iou1, iou2 = 15 / 31, 1.0, 0.0
    assert abs(res["IoU-a"] - 100 * iou0) < 1e-4
    assert abs(res["IoU-b"] - 100 * iou1) < 1e-4
    assert abs(res["IoU-c"] - 100 * iou2) < 1e-4
    assert abs(res["mIoU"] - 100 * (iou0 + iou1 + iou2) / 3) < 1e-4
    assert abs(res["pACC"] - 100 * (15 + 32) / 63) < 1e-4


def test_sem_seg_evaluator_perfect(tmp_path):
    from detectron2_tpu.evaluation import SemSegEvaluator

    gt = np.indices((6, 6)).sum(0).astype(np.uint8) % 3
    _register_semseg_dataset(tmp_path, "_test_semseg2", {"im0": gt})
    ev = SemSegEvaluator("_test_semseg2", distributed=False)
    ev.reset()
    inputs = {
        "image_sizes": np.array([[6, 6]]),
        "metadata": [{"file_name": str(tmp_path / "im0.png"), "height": 6, "width": 6}],
    }
    ev.process(inputs, {"sem_seg": _one_hot_logits(gt, 3)[None]})
    res = ev.evaluate()["sem_seg"]
    assert abs(res["mIoU"] - 100.0) < 1e-6
    assert abs(res["pACC"] - 100.0) < 1e-6
