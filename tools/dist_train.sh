#!/usr/bin/env bash
# Multi-process data-parallel training launcher.
#
# TPU-native analog of the reference `tools/dist_train.sh` (which wraps
# `torch.distributed.launch`): spawns NPROC training processes that form
# one `jax.distributed` cluster via a local coordinator. On a real TPU
# pod, run ONE process per host instead (jax.distributed auto-detects
# the pod topology — just pass --distributed without --coordinator);
# this script's N-processes-on-one-host form is for CPU-mesh testing
# and multi-process-per-node setups.
#
# Usage: tools/dist_train.sh CONFIG NPROC [extra tools/train.py args...]
set -euo pipefail

CONFIG=$1
NPROC=$2
shift 2
PORT=${PORT:-29511}

pids=()
for ((i = 0; i < NPROC; i++)); do
  python "$(dirname "$0")/train.py" "$CONFIG" \
    --distributed --coordinator "localhost:${PORT}" \
    --num-processes "$NPROC" --process-id "$i" "$@" &
  pids+=($!)
done

rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
