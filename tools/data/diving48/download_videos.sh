#!/usr/bin/env bash
# Diving48 videos tarball
# (reference tools/data/diving48/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/diving48"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "http://www.svcl.ucsd.edu/projects/resound/Diving48_rgb.tar.gz" --out-dir "$DATA" --extract
[ -d "$DATA/rgb" ] && mv "$DATA/rgb" "$DATA/videos" || true
