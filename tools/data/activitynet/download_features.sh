#!/usr/bin/env bash
# CUHK 100-snippet TSN features (google-drive hosted)
# (reference tools/data/activitynet/download_features.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
# the
# csv_mean_100 feature archive lives on google drive; _download.py cannot
# follow the interactive confirm flow — fetch it in a browser (id
# 1ISemndlSDS2FtqQOKL0t3Cjj9yk2yznF, csv_mean_100.zip) and pass the path.
ARCHIVE="${1:?usage: $0 /path/to/csv_mean_100.zip}"
mkdir -p "$DATA/activitynet_feature_cuhk"
python -m zipfile -e "$ARCHIVE" "$DATA/activitynet_feature_cuhk/"
echo "features unpacked under $DATA/activitynet_feature_cuhk"
