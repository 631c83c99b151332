#!/usr/bin/env bash
# ActivityNet videos for the BSN pipeline (video_info_new.csv ids)
# (reference tools/data/activitynet/download_bsn_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
python "$REPO/tools/data/activitynet/download.py" \
  --video-info "$DATA/video_info_new.csv" \
  --output-dir "$DATA/videos"
