#!/bin/bash
# Sequentially run the zoo benchmark rows from BASELINE.md (RetinaNet /
# Keypoint / Panoptic FPN / Faster R-CNN FPN + C4 / ViTDet train) and append
# one JSON line per row to $OUT (default: repo-local, so the measurements
# land in version control — round 3 wrote to /tmp and lost them).
set -u
OUT=${1:-/root/repo/docs/notes/bench_rows.jsonl}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "== $* ==" >> "$OUT.log"
  timeout 1800 python tools/bench_zoo.py "$@" >> "$OUT" 2>> "$OUT.log"
  echo "rc=$?" >> "$OUT.log"
}

run --config COCO-Detection/retinanet_R_50_FPN_3x.yaml --batch 16 --baseline-s-im 0.041
run --config COCO-Detection/faster_rcnn_R_50_FPN_3x.yaml --batch 16 --baseline-s-im 0.038
run --config COCO-Keypoints/keypoint_rcnn_R_50_FPN_3x.yaml --batch 16 --baseline-s-im 0.066
run --config COCO-PanopticSegmentation/panoptic_fpn_R_50_3x.yaml --batch 16 --baseline-s-im 0.053
run --config COCO-Detection/faster_rcnn_R_50_C4_3x.yaml --batch 8 --baseline-s-im 0.102
run --config configs/ViTDet/mask_rcnn_vitdet_b_100ep.py --batch 8 --hw 1024,1024 --train --iters 10
echo DONE >> "$OUT.log"
