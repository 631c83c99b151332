#!/usr/bin/env bash
# Rawframe train/test filelists from the official splits
# (reference tools/data/ucf101/generate_rawframes_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ucf101"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" ucf101 "$DATA/annotations" "$DATA" --format rawframes --level 2 --frame-root "$DATA/rawframes"
echo "rawframes filelists written to $DATA"
