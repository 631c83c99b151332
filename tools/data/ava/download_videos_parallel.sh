#!/usr/bin/env bash
# AVA trainval videos via the parallel python downloader
# (reference tools/data/ava/download_videos_parallel.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
python "$REPO/tools/data/ava/download_videos_parallel.py" \
  "$DATA/annotations/ava_file_names_trainval_v2.1.txt" "$DATA/videos"
