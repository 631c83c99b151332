#!/usr/bin/env bash
# THUMOS'14 temporal annotations
# (reference tools/data/thumos14/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/thumos14"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "http://crcv.ucf.edu/THUMOS14/Validation_set/TH14_Temporal_annotations_validation.zip" \
  "http://crcv.ucf.edu/THUMOS14/test_set/TH14_Temporal_annotations_test.zip" \
  --out-dir "$DATA/annotations" --extract
