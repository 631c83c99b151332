#!/usr/bin/env bash
# AVA csv annotations
# (reference tools/data/ava/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ava"
mkdir -p "$DATA"
VERSION=${1:-2.1}
python "$REPO/tools/data/_download.py" "https://research.google.com/ava/download/ava_v$VERSION.zip" \
  --out-dir "$DATA/annotations" --extract
