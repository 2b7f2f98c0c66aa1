#!/bin/bash
# Post-performance-ladder TPU queue: reference sizes ladders (--warmup,
# compile excluded), full-size noise suite, bench report, headline bench.
# Run AFTER the performance ladder driver exits; logs to bench_results/.
set -u
cd "$(dirname "$0")/.."
LOG=bench_results/post_ladder.log
echo "=== post_ladder start $(date -u +%H:%M:%S) ===" >> "$LOG"

for m in icp nicp cpd; do
  bash tools/run_ladder.sh sizes "$m" bench_results \
    bench_results/sizes_ladder_"$m".log
  echo "sizes-$m done rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
done

timeout 3600 python tools/noise_suite_full.py \
  > bench_results/noise_suite_full.log 2>&1
echo "noise_suite_full rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 3600 python tools/bench_report.py >> "$LOG" 2>&1
echo "bench_report rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 1200 python bench.py >> "$LOG" 2>&1
echo "bench rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
echo "=== post_ladder complete ===" >> "$LOG"
