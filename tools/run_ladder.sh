#!/bin/bash
# Run a benchmark test set to completion across relayed-TPU worker
# crashes: relaunch with --resume until the process exits cleanly, and
# give up only when an attempt makes no forward progress (same CSV row
# count twice in a row), so a deterministic per-rung fault cannot loop
# forever.
#
# Usage: tools/run_ladder.sh <test-set> <method> <out-dir> <log-file>
set -u
TEST_SET=${1:?test set}
METHOD=${2:?method}
OUT=${3:?out dir}
LOG=${4:?log file}
CSV="$OUT/$TEST_SET-$METHOD.csv"

rows() { [ -f "$CSV" ] && grep -c ';' "$CSV" || echo 0; }

prev=-1
stuck=0
for attempt in $(seq 1 40); do
  cur=$(rows)
  if [ "$cur" -eq "$prev" ]; then
    stuck=$((stuck+1))
    # a relayed worker crash right after relaunch looks like "no
    # progress" even when the rung itself is fine — only give up after
    # three consecutive zero-progress attempts (a genuinely
    # deterministic per-rung fault)
    if [ "$stuck" -ge 3 ]; then
      echo "[run_ladder] no progress after $stuck attempts (rows=$cur); giving up" >> "$LOG"
      exit 1
    fi
  else
    stuck=0
  fi
  prev=$cur
  echo "[run_ladder] attempt $attempt (rows so far: $cur)" >> "$LOG"
  python -m tpuslam --test-set "$TEST_SET" --methods "$METHOD" \
    --out "$OUT" --warmup --resume >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[run_ladder] complete after attempt $attempt (rows: $(rows))" >> "$LOG"
    exit 0
  fi
  # let a crashed relay worker recover before relaunching; back off
  # harder when the same rung keeps failing
  sleep $((45 + 60 * stuck))
done
echo "[run_ladder] attempt budget exhausted" >> "$LOG"
exit 1
