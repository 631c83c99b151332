#!/usr/bin/env bash
# Kinetics rawframes filelists from the csv annotations
# (reference tools/data/kinetics/generate_rawframes_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
python "$REPO/tools/data/parse_file_list.py" "$DATASET" "$DATA/annotations" "$DATA" --format rawframes --level 2 --frame-root "$DATA/rawframes_train"
