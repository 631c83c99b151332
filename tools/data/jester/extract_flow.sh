#!/usr/bin/env bash
# Farneback flow from the encoded videos
# (reference tools/data/jester/extract_flow.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/jester"
mkdir -p "$DATA"
python "$REPO/tools/data/build_rawframes.py" "$DATA/videos" "$DATA/rawframes" --task flow --level 1
echo "flow frames written to $DATA/rawframes"
