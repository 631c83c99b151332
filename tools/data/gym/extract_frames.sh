#!/usr/bin/env bash
# RGB + flow rawframes from the subaction clips
# (reference tools/data/gym/extract_frames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/gym"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/subactions" "$DATA/subaction_frames" --task both --level 1
