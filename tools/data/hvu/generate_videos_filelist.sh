#!/usr/bin/env bash
# HVU per-category json filelists (videos)
# (reference tools/data/hvu/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hvu"
mkdir -p "$DATA"
for split in Train Val; do
  lc=$(echo "$split" | tr "A-Z" "a-z")
  python "$REPO/tools/data/hvu/generate_file_list.py" \
    --input_csv "$DATA/annotations/HVU_${split}_V1.0.csv" \
    --src_dir "$DATA/videos_${lc}" \
    --output "$DATA/hvu_${lc}.json" --mode videos
done
