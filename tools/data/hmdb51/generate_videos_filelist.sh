#!/usr/bin/env bash
# Video filelists from the official splits
# (reference tools/data/hmdb51/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hmdb51"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" hmdb51 "$DATA/annotations" "$DATA" --format videos --level 2
echo "videos filelists written to $DATA"
