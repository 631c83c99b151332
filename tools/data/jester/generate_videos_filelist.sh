#!/usr/bin/env bash
# Video filelists
# (reference tools/data/jester/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/jester"
mkdir -p "$DATA"
# no official-split parser for jester: scan the videos tree (class-per-directory)
python "$REPO/tools/data/build_file_list.py" "$DATA/videos" "$DATA"
echo "videos filelists written to $DATA"
