#!/usr/bin/env bash
# Video filelists from the V2 jsons
# (reference tools/data/diving48/generate_videos_filelist.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/diving48"
mkdir -p "$DATA"
python "$REPO/tools/data/parse_file_list.py" diving48 "$DATA/annotations" "$DATA" --format videos --level 1
echo "videos filelists written to $DATA"
