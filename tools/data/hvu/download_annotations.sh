#!/usr/bin/env bash
# HVU annotation csvs (github)
# (reference tools/data/hvu/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hvu"
mkdir -p "$DATA"
command -v git >/dev/null || { echo "install git"; exit 1; }
[ -d "$DATA/HVU-Dataset" ] || git clone \
  https://github.com/holistic-video-understanding/HVU-Dataset.git "$DATA/HVU-Dataset"
mkdir -p "$DATA/annotations"
cp "$DATA"/HVU-Dataset/*.csv "$DATA/annotations/" 2>/dev/null || true
