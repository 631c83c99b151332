#!/usr/bin/env bash
# Cut every video to its 15th-30th minute
# (reference tools/data/ava/cut_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
python "$REPO/tools/data/ava/cut_videos.py" "$DATA/videos" "$DATA/videos_15min"
