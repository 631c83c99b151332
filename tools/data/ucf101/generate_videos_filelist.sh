#!/usr/bin/env bash
# Video train/test filelists from the official splits
# (reference tools/data/ucf101/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ucf101"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" ucf101 "$DATA/annotations" "$DATA" --format videos --level 2
echo "videos filelists written to $DATA"
