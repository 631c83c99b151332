#!/usr/bin/env bash
# ActivityNet source videos from YouTube (action-annotation ids)
# (reference tools/data/activitynet/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
python "$REPO/tools/data/activitynet/download.py" \
  --anno-file "$DATA/anet_anno_action.json" \
  --output-dir "$DATA/videos"
