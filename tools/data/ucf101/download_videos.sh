#!/usr/bin/env bash
# UCF-101 videos (rar archive)
# (reference tools/data/ucf101/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ucf101"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "https://www.crcv.ucf.edu/datasets/human-actions/ucf101/UCF101.rar" --out-dir "$DATA"
command -v unrar >/dev/null || { echo "install unrar to unpack"; exit 1; }
unrar x "$DATA/UCF101.rar" "$DATA/" && mv "$DATA/UCF-101" "$DATA/videos"
