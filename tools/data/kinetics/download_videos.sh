#!/usr/bin/env bash
# Kinetics videos via the YouTube downloader tool
# (reference tools/data/kinetics/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
python "$REPO/tools/data/kinetics/download.py" "$DATA/annotations/kinetics_train.csv" "$DATA/videos_train"
python "$REPO/tools/data/kinetics/download.py" "$DATA/annotations/kinetics_val.csv" "$DATA/videos_val"
