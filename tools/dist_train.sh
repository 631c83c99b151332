#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh analog).
#
# The reference launches one process per GPU via torch.distributed.launch;
# on TPU pods you launch ONE process per host (each host drives its local
# chips) with the coordinator address in env:
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 JAX_NUM_PROCESSES=<n> \
#   JAX_PROCESS_ID=<i> tools/dist_train.sh <config> [args...]
#
# On Cloud TPU VMs the jax.distributed defaults discover all of this
# automatically and plain `tools/dist_train.sh <config>` on every worker
# suffices.
set -euo pipefail
CONFIG=$1
shift
exec python "$(dirname "$0")/train.py" "$CONFIG" --multi-host "$@"
