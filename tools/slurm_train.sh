#!/usr/bin/env bash
# SLURM training launcher (reference tools/slurm_train.sh analog).
#
#   ./tools/slurm_train.sh <partition> <job_name> <config> [--work-dir ...]
#
# Launches one task per node (TPU hosts drive their local chips);
# jax.distributed discovers the coordinator from the SLURM environment
# (SLURM_JOB_NODELIST / SLURM_PROCID / SLURM_NTASKS).
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
     python "$(dirname "$0")/train.py" "$CONFIG" --multi-host "$@"
