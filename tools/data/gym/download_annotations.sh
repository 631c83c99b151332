#!/usr/bin/env bash
# FineGym v1.0 annotations
# (reference tools/data/gym/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/gym"
mkdir -p "$DATA"
mkdir -p "$DATA/annotations"
python "$REPO/tools/data/_download.py" \
  "https://sdolivia.github.io/FineGym/resources/dataset/finegym_annotation_info_v1.0.json" \
  "https://sdolivia.github.io/FineGym/resources/dataset/gym99_train_element_v1.0.txt" \
  "https://sdolivia.github.io/FineGym/resources/dataset/gym99_val_element.txt" \
  --out-dir "$DATA/annotations"
mv "$DATA/annotations/finegym_annotation_info_v1.0.json" "$DATA/annotations/annotation.json"
mv "$DATA/annotations/gym99_train_element_v1.0.txt" "$DATA/annotations/gym99_train_org.txt"
mv "$DATA/annotations/gym99_val_element.txt" "$DATA/annotations/gym99_val_org.txt"
