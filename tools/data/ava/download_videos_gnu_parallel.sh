#!/usr/bin/env bash
# AVA trainval videos (GNU-parallel variant of the S3 fetch)
# (reference tools/data/ava/download_videos_gnu_parallel.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
command -v parallel >/dev/null || { echo "install GNU parallel (or use download_videos_parallel.sh)"; exit 1; }
mkdir -p "$DATA/videos"
parallel -j 8 -a "$DATA/annotations/ava_file_names_trainval_v2.1.txt" \
  python "$REPO/tools/data/_download.py" "https://s3.amazonaws.com/ava-dataset/trainval/{}" --out-dir "$DATA/videos"
