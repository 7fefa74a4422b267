#!/usr/bin/env bash
# Launch an N-process multi-controller run of tools/multihost_run.py on
# this machine (the reference's ROS process-graph analogue, run.sh:11-22;
# across real hosts, run the same command per host with JAX_PROCESS_ID
# set to the host rank and the coordinator reachable over the network).
#
# Usage: tools/launch_multihost.sh <num_processes> <out_prefix> [solver]
set -eu
N=${1:?num_processes}
OUT=${2:?out_prefix}
SOLVER=${3:-dist}
PORT=$(( 20000 + RANDOM % 20000 ))
cd "$(dirname "$0")/.."
pids=()
for ((i=0; i<N; i++)); do
  JAX_COORDINATOR_ADDRESS="127.0.0.1:${PORT}" \
  JAX_NUM_PROCESSES="$N" JAX_PROCESS_ID="$i" \
  python tools/multihost_run.py --out "${OUT}_p${N}.npz" \
      --solver "$SOLVER" > "${OUT}_p${N}_rank${i}.log" 2>&1 &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
