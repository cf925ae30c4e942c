#!/bin/bash -e
# Inference accuracy regression tests against zoo checkpoints
# (reference dev/run_inference_tests.sh).
BIN="python tools/train_net.py"
OUTPUT="inference_test_output"
mkdir -p "$OUTPUT"

for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --eval-only --config-file "$cfg" \
    OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"
done
echo "inference tests done"
