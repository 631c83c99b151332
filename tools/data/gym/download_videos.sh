#!/usr/bin/env bash
# FineGym source videos from YouTube
# (reference tools/data/gym/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/gym"
mkdir -p "$DATA"
python "$REPO/tools/data/gym/download.py" --data-root "$DATA"
