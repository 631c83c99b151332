#!/usr/bin/env bash
# Extract rgb rawframes
# (reference tools/data/thumos14/extract_rgb_frames_opencv.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/thumos14"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task rgb --level 1
