#!/usr/bin/env bash
# AVA trainval videos (S3-hosted)
# (reference tools/data/ava/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "https://s3.amazonaws.com/ava-dataset/annotations/ava_file_names_trainval_v2.1.txt" \
  --out-dir "$DATA/annotations"
mkdir -p "$DATA/videos"
while read -r vid; do
  python "$REPO/tools/data/_download.py" "https://s3.amazonaws.com/ava-dataset/trainval/$vid" --out-dir "$DATA/videos"
done < "$DATA/annotations/ava_file_names_trainval_v2.1.txt"
