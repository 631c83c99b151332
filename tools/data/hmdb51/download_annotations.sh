#!/usr/bin/env bash
# Official HMDB51 split files
# (reference tools/data/hmdb51/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/hmdb51"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" "http://serre-lab.clps.brown.edu/wp-content/uploads/2013/10/test_train_splits.rar" --out-dir "$DATA/annotations"
command -v unrar >/dev/null || { echo "install unrar to unpack"; exit 1; }
unrar x "$DATA/annotations/test_train_splits.rar" "$DATA/annotations/"
