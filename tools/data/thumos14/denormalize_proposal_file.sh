#!/usr/bin/env bash
# Rewrite normalized proposal files against the local rawframes
# (reference tools/data/thumos14/denormalize_proposal_file.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/thumos14"
mkdir -p "$DATA"
for split in val test; do
  python "$REPO/tools/data/denormalize_proposal_file.py" \
    "$DATA/proposals/thumos14_tag_${split}_normalized_proposal_list.txt" \
    --frame-root "$DATA/rawframes" \
    --out "$DATA/proposals/thumos14_tag_${split}_proposal_list.txt"
done
