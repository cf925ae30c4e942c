#!/bin/bash
# Parse speed/memory/AP metrics from a training log (the role of reference
# dev/parse_results.sh, adapted to this framework's log lines).

LOG="$1"
if [[ -z "$LOG" ]]; then
    echo "Usage: $0 /path/to/log/file"
    exit 1
fi

trainspeed=$(grep -o 'Overall training.*' "$LOG" | grep -Eo '\(.*\)' | grep -o '[0-9.]*' | head -n1)
echo "Training speed: ${trainspeed:-n/a} s/it"

inferencespeed=$(grep -o 'Total inference pure.*' "$LOG" | tail -n1 | grep -Eo '\(.*\)' | grep -o '[0-9.]*' | head -n1)
echo "Inference speed: ${inferencespeed:-n/a} s/img"

memory=$(grep -o 'max[_ ]mem: [0-9]*' "$LOG" | tail -n1 | grep -o '[0-9]*')
echo "Device memory: ${memory:-n/a} MB"

echo "copypaste (bbox AP / segm AP rows):"
grep -o 'copypaste:.*' "$LOG" | tail -n4
