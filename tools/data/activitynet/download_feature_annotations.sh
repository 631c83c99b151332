#!/usr/bin/env bash
# BSN-style annotations for the pre-extracted-feature pipeline
# (reference tools/data/activitynet/download_feature_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "https://raw.githubusercontent.com/wzmsltw/BSN-boundary-sensitive-network/master/data/activitynet_annotations/anet_anno_action.json" \
  "https://raw.githubusercontent.com/wzmsltw/BSN-boundary-sensitive-network/master/data/activitynet_annotations/video_info_new.csv" \
  --out-dir "$DATA"
python "$REPO/tools/data/activitynet/process_annotations.py" --data-root "$DATA"
