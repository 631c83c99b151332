#!/usr/bin/env bash
# Lay the manually-downloaded archive out as videos/ + annotations/
# (reference tools/data/mmit/preprocess_data.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/mmit"
mkdir -p "$DATA"
ARCHIVE="${1:-$DATA/Moments_in_Time_Raw.zip}"
[ -f "$ARCHIVE" ] && python -m zipfile -e "$ARCHIVE" "$DATA/"
mkdir -p "$DATA/videos" "$DATA/annotations"
for d in training validation; do
  [ -d "$DATA/$d" ] && mv "$DATA/$d" "$DATA/videos/$d"
done
mv "$DATA"/*.txt "$DATA"/*.csv "$DATA/annotations/" 2>/dev/null || true
echo "layout ready under $DATA"
