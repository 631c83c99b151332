#!/usr/bin/env bash
# Rawframe filelists
# (reference tools/data/jester/generate_rawframes_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/jester"
mkdir -p "$DATA"
# no official-split parser for jester: scan the rawframes tree (class-per-directory)
python "$REPO/tools/data/build_file_list.py" "$DATA/rawframes" "$DATA" --rawframes
echo "rawframes filelists written to $DATA"
