#!/usr/bin/env bash
# Multi-host evaluation launcher (reference tools/dist_test.sh analog).
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" --checkpoint "$CHECKPOINT" "$@"
