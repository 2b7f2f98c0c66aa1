#!/bin/bash
# Sequential TPU work queue for the round-2 pending measurements.
# ONE TPU process at a time (relay rule: concurrent/abandoned queued
# work wedges the relay). Each step gets a bounded timeout and its own
# retry budget; a step that keeps failing is skipped so the rest of the
# queue still runs. Logs to bench_results/r2_queue.log.
#
# Usage: tools/run_r2_queue.sh
set -u
cd "$(dirname "$0")/.."
LOG=bench_results/r2_queue.log
echo "=== r2 queue start $(date -u +%FT%TZ) ===" >> "$LOG"

run_step() { # name timeout_s retries cmd...
  local name=$1 tmo=$2 tries=$3
  shift 3
  for attempt in $(seq 1 "$tries"); do
    echo "[queue] $name attempt $attempt: $*" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
      echo "[queue] $name OK" >> "$LOG"
      return 0
    fi
    echo "[queue] $name failed rc=$rc" >> "$LOG"
    if [ "$attempt" -lt "$tries" ]; then
      sleep $((120 * attempt)) # crashed relay workers need minutes
    fi
  done
  echo "[queue] $name SKIPPED after $tries attempts" >> "$LOG"
  return 1
}

# 1. post-dedup kernel revalidation (hot-path regression gate)
run_step revalidate 2400 3 python tools/r2_revalidate.py

# 2. large-cloud CPD (BASELINE config 4; first 376k compiles are slow)
run_step cpd_large 5400 3 python tools/cpd_large.py

# 3. full measured-numbers table refresh — includes the batched
#    multi-pair throughput (BASELINE config 5) added after the last
#    successful table run
run_step bench_report 5400 2 python tools/bench_report.py

# 4. prealigned-ICP convergence grid (225 cells, 5 shapes)
run_step conv_prealign 10800 2 \
  env TPUSLAM_CONV_PREALIGN=1 python tools/convergence_study.py

# 5. headline bench sanity
run_step bench 2400 2 python bench.py

echo "=== r2 queue done $(date -u +%FT%TZ) ===" >> "$LOG"
