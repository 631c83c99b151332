#!/usr/bin/env bash
# Extract both rawframes
# (reference tools/data/kinetics/extract_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos_train" "$DATA/rawframes_train" --task both --level 2
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos_val" "$DATA/rawframes_val" --task both --level 2
