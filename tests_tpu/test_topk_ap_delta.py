"""AP impact of the approx-top-k decode, measured on chip.

ops/topk.py routes the dense one-stage decode through lax.approx_max_k on
TPU (recall_target 0.99). test_topk_recall.py gates the RAW recall on iid
scores, but recall on iid scores is not an AP delta: this test closes that
gap by training a tiny RetinaNet on the synthetic rectangle dataset (the
same assets as tests/test_train_to_ap.py) ON THE CHIP, then evaluating the
same trained parameters twice — once with the default approx dispatch, once
with cfg.TEST.EXACT_TOPK=True — and gating the AP difference.

Expected delta ~0: the candidates approx_max_k may miss sit in the
sub-threshold tail that NMS / top-100 discards anyway. The measured number
is recorded in docs/notes/compatibility.md next to the RoIAlign tables.

Run on a real chip: PYTHONPATH=. python -m pytest tests_tpu/ -q
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def test_approx_vs_exact_topk_ap_delta(tmp_path):
    from test_train_to_ap import _SIZE, _make_synthetic_coco

    from detectron2_tpu.config import get_cfg
    from detectron2_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from detectron2_tpu.data.datasets import register_coco_instances
    from detectron2_tpu.engine import DefaultTrainer
    from detectron2_tpu.evaluation import COCOEvaluator
    from detectron2_tpu.modeling import build_model

    json_file, img_dir = _make_synthetic_coco(str(tmp_path))
    name = "synth_topk_ab"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_coco_instances(name, {}, json_file, img_dir)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 20], [32, 40], [64, 80], [128, 160], [256, 320]]
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (_SIZE,)
    cfg.INPUT.MAX_SIZE_TRAIN = _SIZE
    cfg.INPUT.MIN_SIZE_TEST = _SIZE
    cfg.INPUT.MAX_SIZE_TEST = _SIZE
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.BASE_LR = 0.02
    # random-init focal-loss grads spike on tiny synthetic batches (NaN at
    # iter 4 unclipped at lr=0.01) — clip like the reference RetinaNet
    # stabilization recipes
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.WARMUP_ITERS = 200
    cfg.SOLVER.MAX_ITER = 600
    cfg.SOLVER.STEPS = (500,)
    cfg.SOLVER.CHECKPOINT_PERIOD = 10_000
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    class Trainer(DefaultTrainer):
        @classmethod
        def build_evaluator(cls, cfg, dataset_name):
            return COCOEvaluator(
                dataset_name, output_dir=os.path.join(cfg.OUTPUT_DIR, "eval"), distributed=False
            )

    trainer = Trainer(cfg)
    trainer.train()
    params = trainer._trainer.state.params

    assert cfg.TEST.EXACT_TOPK is False  # default: approx dispatch on TPU
    res_approx = Trainer.test(cfg, trainer.model, params=params)

    cfg_exact = cfg.clone()
    cfg_exact.defrost()
    cfg_exact.TEST.EXACT_TOPK = True
    model_exact = build_model(cfg_exact)
    res_exact = Trainer.test(cfg_exact, model_exact, params=params)

    ap_a = res_approx["bbox"]["AP"]
    ap_e = res_exact["bbox"]["AP"]
    print(f"\ntopk A/B on chip: approx AP={ap_a:.3f} exact AP={ap_e:.3f} delta={ap_a - ap_e:+.3f}")
    assert np.isfinite(ap_a) and np.isfinite(ap_e)
    assert ap_e >= 50.0, f"exact AP {ap_e} — training did not converge, A/B meaningless"
    # the gate: approx decode must cost (essentially) no AP
    assert abs(ap_a - ap_e) <= 1.0, f"approx-topk AP delta too large: {ap_a} vs {ap_e}"
