#!/usr/bin/env bash
# RGB + flow rawframes
# (reference tools/data/hvu/extract_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hvu"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos_train" "$DATA/rawframes_train" --task both --level 1
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos_val" "$DATA/rawframes_val" --task both --level 1
