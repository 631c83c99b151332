#!/usr/bin/env bash
# Rawframe filelists
# (reference tools/data/mit/generate_rawframes_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/mit"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" mit "$DATA/annotations" "$DATA" --format rawframes --level 2 --frame-root "$DATA/rawframes"
echo "rawframes filelists written to $DATA"
