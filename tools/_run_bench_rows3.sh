#!/bin/bash
# Round-4 tranche: the TRAINING rows for every family the reference
# publishes a train s/it for (reference MODEL_ZOO.md "Common Settings":
# batch 16 over 8 V100 -> per-GPU img/s = 2 / s_it; bench_zoo converts via
# --baseline-s-im). Inference rows were measured in rounds 3-4
# (docs/notes/bench_rows.jsonl).
set -u
OUT=${1:-/root/repo/docs/notes/bench_rows.jsonl}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "== $* ==" >> "$OUT.log"
  timeout 1800 python tools/bench_zoo.py "$@" >> "$OUT" 2>> "$OUT.log"
  echo "rc=$?" >> "$OUT.log"
}

# reference train s/it: mask 0.261, faster-FPN 0.210, retinanet 0.205,
# keypoint 0.316, panoptic 0.302, C4 0.551 (MODEL_ZOO.md:101-691)
run --config COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml --batch 8 --train --iters 10 --baseline-s-im 0.261
run --config COCO-Detection/faster_rcnn_R_50_FPN_3x.yaml --batch 8 --train --iters 10 --baseline-s-im 0.210
run --config COCO-Detection/retinanet_R_50_FPN_3x.yaml --batch 8 --train --iters 10 --baseline-s-im 0.205
run --config COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x.yaml --batch 8 --train --iters 10 --baseline-s-im 0.316
run --config COCO-PanopticSegmentation/panoptic_fpn_R_50_3x.yaml --batch 8 --train --iters 10 --baseline-s-im 0.302
run --config COCO-Detection/faster_rcnn_R_50_C4_3x.yaml --batch 4 --train --iters 10 --baseline-s-im 0.551
echo DONE3 >> "$OUT.log"
