#!/usr/bin/env bash
# Rawframe filelists from the official jsons
# (reference tools/data/sthv2/generate_rawframes_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/sthv2"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" sthv2 "$DATA/annotations" "$DATA" --format rawframes --level 1 --frame-root "$DATA/rawframes"
echo "rawframes filelists written to $DATA"
