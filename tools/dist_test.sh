#!/usr/bin/env bash
# Multi-process evaluation launcher (reference `tools/dist_test.sh`
# analog). Each rank evaluates a shard of the dataset; rank 0 collects
# part results and prints metrics (see `api.run_eval`).
#
# Usage: tools/dist_test.sh CONFIG CHECKPOINT NPROC [extra args...]
set -euo pipefail

CONFIG=$1
CHECKPOINT=$2
NPROC=$3
shift 3
PORT=${PORT:-29512}

pids=()
for ((i = 0; i < NPROC; i++)); do
  python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" \
    --distributed --coordinator "localhost:${PORT}" \
    --num-processes "$NPROC" --process-id "$i" "$@" &
  pids+=($!)
done

rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
