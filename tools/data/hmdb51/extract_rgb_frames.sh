#!/usr/bin/env bash
# Extract rgb rawframes
# (reference tools/data/hmdb51/extract_rgb_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hmdb51"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task rgb --level 2
echo "RGB frames written to $DATA/rawframes"
