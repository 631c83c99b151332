#!/usr/bin/env bash
# Video filelists
# (reference tools/data/mit/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/mit"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" mit "$DATA/annotations" "$DATA" --format videos --level 2
echo "videos filelists written to $DATA"
