#!/usr/bin/env bash
# Official UCF-101 split files
# (reference tools/data/ucf101/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ucf101"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "https://www.crcv.ucf.edu/wp-content/uploads/2019/03/UCF101TrainTestSplits-RecognitionTask.zip" --out-dir "$DATA/annotations" --extract
