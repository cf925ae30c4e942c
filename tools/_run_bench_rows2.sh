#!/bin/bash
# Second bench tranche: the C4 retry (after the roi-align channel-chunk fix),
# the ViTDet L/H rows, the LSJ new-baseline row, and the train-MFU row.
set -u
OUT=${1:-/root/repo/docs/notes/bench_rows.jsonl}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "== $* ==" >> "$OUT.log"
  timeout 1800 python tools/bench_zoo.py "$@" >> "$OUT" 2>> "$OUT.log"
  echo "rc=$?" >> "$OUT.log"
}

run --config COCO-Detection/faster_rcnn_R_50_C4_3x.yaml --batch 8 --baseline-s-im 0.102
run --config configs/ViTDet/mask_rcnn_vitdet_l_100ep.py --batch 4 --hw 1024,1024 --baseline-s-im 0.125
run --config configs/ViTDet/mask_rcnn_vitdet_h_75ep.py --batch 2 --hw 1024,1024 --baseline-s-im 0.178
run --config configs/new_baselines/mask_rcnn_R_50_FPN_400ep_LSJ.py --batch 16 --hw 1024,1024 --baseline-s-im 0.069
# ViTDet-B train: batch 8 un-rematted needs 25.8G HBM (16G chip) -> remat +
# batch 4. Reference: 0.314 s/it at 1 img/GPU (64 GPUs) = 3.18 img/s/chip.
run --config configs/ViTDet/mask_rcnn_vitdet_b_100ep.py --batch 4 --hw 1024,1024 --train --iters 10 --use-checkpoint --baseline-img-s 3.18
echo "== bench_vitdet_l (cascade) ==" >> "$OUT.log"
timeout 1800 python tools/bench_vitdet_l.py >> "$OUT" 2>> "$OUT.log"
echo "rc=$?" >> "$OUT.log"
echo "== _bench_train (train MFU) ==" >> "$OUT.log"
timeout 1800 python tools/_bench_train.py >> "$OUT.log" 2>&1
echo "rc=$?" >> "$OUT.log"
echo DONE2 >> "$OUT.log"
