#!/usr/bin/env bash
# Extract rgb rawframes
# (reference tools/data/sthv2/extract_rgb_frames_opencv.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/sthv2"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task rgb --level 1
echo "RGB frames written to $DATA/rawframes"
