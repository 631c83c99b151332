#!/usr/bin/env bash
# Diving48 V2 annotation jsons
# (reference tools/data/diving48/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/diving48"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "http://www.svcl.ucsd.edu/projects/resound/Diving48_V2_train.json" "http://www.svcl.ucsd.edu/projects/resound/Diving48_V2_test.json" "http://www.svcl.ucsd.edu/projects/resound/Diving48_vocab.json" --out-dir "$DATA/annotations"
