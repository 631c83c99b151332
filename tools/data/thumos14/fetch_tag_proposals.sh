#!/usr/bin/env bash
# Pre-computed TAG proposal lists
# (reference tools/data/thumos14/fetch_tag_proposals.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/thumos14"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "https://open-mmlab.s3.ap-northeast-2.amazonaws.com/mmaction/filelist/thumos14_tag_val_normalized_proposal_list.txt" \
  "https://open-mmlab.s3.ap-northeast-2.amazonaws.com/mmaction/filelist/thumos14_tag_test_normalized_proposal_list.txt" \
  --out-dir "$DATA/proposals"
