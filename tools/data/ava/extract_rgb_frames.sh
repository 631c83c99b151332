#!/usr/bin/env bash
# Extract rgb rawframes from the 15-minute cuts (OpenCV decode — this repo has no ffmpeg CLI)
# (reference tools/data/ava/extract_rgb_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos_15min" "$DATA/rawframes" --task rgb --level 1
