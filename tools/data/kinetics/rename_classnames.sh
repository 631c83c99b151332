#!/usr/bin/env bash
# Strip characters that break path handling from class directories
# (reference tools/data/kinetics/rename_classnames.sh — re-expressed over this repo's
# native prep tools).
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../../.." && pwd)"
DATA="$REPO/data/kinetics"
mkdir -p "$DATA"
DATASET=${1:-kinetics400}
case "$DATASET" in kinetics400|kinetics600|kinetics700) ;; *)
  echo "usage: $0 [kinetics400|kinetics600|kinetics700]"; exit 1 ;; esac
DATA="$REPO/data/$DATASET"
for split in train_original val_original; do
  [ -d "$DATA/$split" ] || continue
  (cd "$DATA/$split" && for class in *; do
     renamed="${class//)/-}"; renamed="${renamed//(/-}"
     [ "$class" = "$renamed" ] || mv "$class" "$renamed"
   done)
done
