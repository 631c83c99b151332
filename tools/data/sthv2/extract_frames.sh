#!/usr/bin/env bash
# Extract both rawframes
# (reference tools/data/sthv2/extract_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/sthv2"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task both --level 1
echo "RGB + Farneback flow frames written to $DATA/rawframes"
