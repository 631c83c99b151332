#!/usr/bin/env bash
# SLURM evaluation launcher (reference tools/slurm_test.sh analog).
#
#   ./tools/slurm_test.sh <partition> <job_name> <config> [--checkpoint ...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
     --job-name="$JOB_NAME" \
     --nodes="$NODES" \
     --ntasks-per-node=1 \
     --kill-on-bad-exit=1 \
     $SRUN_ARGS \
     python "$(dirname "$0")/test.py" "$CONFIG" "$@"
