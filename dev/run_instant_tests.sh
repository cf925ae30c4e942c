#!/bin/bash -e
# Tiny real-data smoke trainings (reference dev/run_instant_tests.sh).
BIN="python tools/train_net.py"
OUTPUT="instant_test_output"
mkdir -p "$OUTPUT"

for cfg in configs/quick_schedules/*instant_test.yaml; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --config-file "$cfg" \
    SOLVER.IMS_PER_BATCH 2 \
    OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"
done
echo "instant tests done"
