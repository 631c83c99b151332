#!/usr/bin/env bash
# Pre-extracted PoseC3D skeleton pickles
# (reference tools/data/skeleton/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/posec3d"
mkdir -p "$DATA"
DATASET=${1:-gym}
python "$REPO/tools/data/_download.py" \
  "https://download.openmmlab.com/mmaction/posec3d/${DATASET}_train.pkl" \
  "https://download.openmmlab.com/mmaction/posec3d/${DATASET}_val.pkl" \
  --out-dir "$DATA"
