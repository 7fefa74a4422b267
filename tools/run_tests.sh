#!/usr/bin/env bash
# One-command green suite (VERDICT r2 item 6).
#
# A single pytest process accumulates XLA compile memory across the ~120
# tests (heavy shard_map programs included) and can die with a compile-time
# segfault near the end of the run.  Sharding the suite into a few pytest
# subprocesses bounds per-process memory while the persistent compile cache
# (.jax_cache, set up in tests/conftest.py) keeps repeat work near zero.
#
# Usage:  tools/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

shards=(
  # heavy shard_map / multi-device programs get their own processes
  "tests/test_time_ba.py"
  "tests/test_distributed.py"
  "tests/test_condensed.py"
  "tests/test_multihost.py"
  # estimator-level end-to-end suites
  "tests/test_e2e.py tests/test_marginalization.py tests/test_calibration.py"
  "tests/test_rendered_pipeline.py tests/test_kitti.py tests/test_checkpoint.py"
  "tests/test_euroc_gate.py"
  # everything else (unit-level)
  "tests/ --ignore=tests/test_time_ba.py --ignore=tests/test_distributed.py \
   --ignore=tests/test_condensed.py --ignore=tests/test_multihost.py \
   --ignore=tests/test_e2e.py --ignore=tests/test_marginalization.py \
   --ignore=tests/test_calibration.py --ignore=tests/test_rendered_pipeline.py \
   --ignore=tests/test_kitti.py --ignore=tests/test_checkpoint.py \
   --ignore=tests/test_euroc_gate.py"
)

total_fail=0
for s in "${shards[@]}"; do
  echo "=== pytest $s ==="
  # shellcheck disable=SC2086
  python -m pytest $s -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    total_fail=$((total_fail + 1))
    echo "--- shard failed (rc=$rc): $s"
  fi
done

if [ $total_fail -ne 0 ]; then
  echo "FAILED: $total_fail shard(s) red"
  exit 1
fi
echo "ALL SHARDS GREEN"
