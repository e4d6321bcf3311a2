#!/usr/bin/env bash
# SLURM evaluation launcher (reference `tools/slurm_test.sh` analog).
#
# Usage: tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT \
#            [extra tools/test.py args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
NODES=${NODES:-1}
TASKS_PER_NODE=${TASKS_PER_NODE:-1}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
  --ntasks-per-node="$TASKS_PER_NODE" --kill-on-bad-exit=1 $SRUN_ARGS \
  python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" \
  --distributed "$@"
