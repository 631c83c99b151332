#!/usr/bin/env bash
# RGB + flow rawframes at short-side 256
# (reference tools/data/activitynet/extract_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task both --level 1 --new-short 256
