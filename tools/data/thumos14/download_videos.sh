#!/usr/bin/env bash
# THUMOS'14 validation + test videos
# (reference tools/data/thumos14/download_videos.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/thumos14"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "https://storage.googleapis.com/thumos14_files/TH14_validation_set_mp4.zip" \
  "https://storage.googleapis.com/thumos14_files/TH14_Test_set_mp4.zip" \
  --out-dir "$DATA" --extract
