#!/usr/bin/env bash
# Encode the distributed rawframes into mp4 videos
# (reference tools/data/jester/encode_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/jester"
mkdir -p "$DATA"
python "$REPO/tools/data/build_videos.py" "$DATA/rawframes" "$DATA/videos" --fps 12 --level 1 --ext jpg
