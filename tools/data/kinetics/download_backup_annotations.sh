#!/usr/bin/env bash
# Kinetics annotations from the deepmind tarball (backup source)
# (reference tools/data/kinetics/download_backup_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
python "$REPO/tools/data/_download.py" "https://storage.googleapis.com/deepmind-media/Datasets/$DATASET.tar.gz" --out-dir "$DATA/annotations" --extract
