#!/usr/bin/env bash
# SLURM training launcher (reference `tools/slurm_train.sh` analog).
# jax.distributed.initialize() auto-detects the SLURM cluster (rank,
# world size, coordinator) from the srun environment — no manual
# coordinator plumbing needed.
#
# Usage: GPUS_PER_NODE=... tools/slurm_train.sh PARTITION JOB_NAME \
#            CONFIG [extra tools/train.py args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NODES=${NODES:-1}
TASKS_PER_NODE=${TASKS_PER_NODE:-1}   # one process per TPU host
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
  --ntasks-per-node="$TASKS_PER_NODE" --kill-on-bad-exit=1 $SRUN_ARGS \
  python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
