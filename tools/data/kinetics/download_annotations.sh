#!/usr/bin/env bash
# Kinetics train/val/test csvs (openmmlab mirror)
# (reference tools/data/kinetics/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
python "$REPO/tools/data/_download.py" "https://download.openmmlab.com/mmaction/dataset/$DATASET/annotations/kinetics_train.csv" "https://download.openmmlab.com/mmaction/dataset/$DATASET/annotations/kinetics_val.csv" "https://download.openmmlab.com/mmaction/dataset/$DATASET/annotations/kinetics_test.csv" --out-dir "$DATA/annotations"
