#!/usr/bin/env bash
# HMDB51 videos (rar archive)
# (reference tools/data/hmdb51/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hmdb51"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "http://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/hmdb51_org.rar" --out-dir "$DATA"
command -v unrar >/dev/null || { echo "install unrar to unpack"; exit 1; }
mkdir -p "$DATA/videos" && unrar x "$DATA/hmdb51_org.rar" "$DATA/videos/"
for f in "$DATA"/videos/*.rar; do unrar x "$f" "$DATA/videos/"; done
