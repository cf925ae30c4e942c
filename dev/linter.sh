#!/bin/bash -e
# Lint/format (reference dev/linter.sh). Uses whatever formatters exist.
cd "$(dirname "${BASH_SOURCE[0]}")/.."

if command -v black &> /dev/null; then
  echo "Running black ..."
  black -l 100 detectron2_tpu/ tools/ tests/
fi
if command -v isort &> /dev/null; then
  echo "Running isort ..."
  isort --profile black -l 100 detectron2_tpu/ tools/ tests/
fi
if command -v flake8 &> /dev/null; then
  echo "Running flake8 ..."
  flake8 --max-line-length 120 --ignore E203,E501,W503,E741 detectron2_tpu/ tools/
fi
echo "lint done"
