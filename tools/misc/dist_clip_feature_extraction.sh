#!/usr/bin/env bash
# Multi-host clip-feature-extraction launcher (reference
# tools/misc/dist_clip_feature_extraction.sh analog — on TPU pods every
# host runs the same program; jax.distributed shards the dataset).
set -euo pipefail
CONFIG=$1
OUT=$2
shift 2
exec python "$(dirname "$0")/clip_feature_extraction.py" "$CONFIG" "$OUT" "$@"
