#!/usr/bin/env bash
# ActivityNet v1.3 taxonomy + action annotations
# (reference tools/data/activitynet/download_annotations.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/ActivityNet"
mkdir -p "$DATA"
python "$REPO/tools/data/_download.py" \
  "http://ec2-52-25-205-214.us-west-2.compute.amazonaws.com/files/activity_net.v1-3.min.json" \
  "https://download.openmmlab.com/mmaction/localization/anet_activity_indexes_val.txt" \
  --out-dir "$DATA/annotations"
