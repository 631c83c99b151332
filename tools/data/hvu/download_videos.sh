#!/usr/bin/env bash
# HVU clips from YouTube
# (reference tools/data/hvu/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hvu"
mkdir -p "$DATA"
python "$REPO/tools/data/hvu/download.py" "$DATA/annotations/HVU_Train_V1.0.csv" "$DATA/videos_train"
python "$REPO/tools/data/hvu/download.py" "$DATA/annotations/HVU_Val_V1.0.csv" "$DATA/videos_val"
