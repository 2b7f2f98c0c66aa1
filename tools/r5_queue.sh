#!/bin/bash
# Round-5 artifact re-record queue: every recorded ladder/grid/suite is
# refreshed on the DE-ALIASED synthetic fixture and the round-5 kernels
# so all published numbers share one vintage.  Old CSVs are suffixed
# .r4 (run_ladder --resume would otherwise treat them as complete).
set -u
cd "$(dirname "$0")/.."
LOG=bench_results/r5_queue.log
echo "=== r5 queue start $(date -u +%H:%M:%S) ===" >> "$LOG"

for f in performance-icp performance-cpd performance-nicp \
         sizes-icp sizes-cpd sizes-nicp; do
  [ -f "bench_results/$f.csv" ] && \
    mv "bench_results/$f.csv" "bench_results/$f.r4.csv"
done

for m in icp cpd nicp; do
  bash tools/run_ladder.sh performance "$m" bench_results \
    bench_results/perf_ladder_"$m"_r5.log
  echo "performance-$m rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
done

for m in icp nicp cpd; do
  bash tools/run_ladder.sh sizes "$m" bench_results \
    bench_results/sizes_ladder_"$m"_r5.log
  echo "sizes-$m rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
done

timeout 7200 python tools/convergence_study.py \
  > bench_results/convergence_r5.log 2>&1
echo "convergence rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

TPUSLAM_CONV_PREALIGN=1 timeout 5400 python tools/convergence_study.py \
  > bench_results/convergence_prealign_r5.log 2>&1
echo "convergence_prealign rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 5400 python tools/noise_suite_full.py \
  > bench_results/noise_suite_full.log 2>&1
echo "noise_suite_full rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 3600 python tools/stage_100k.py \
  > bench_results/stage_100k.log 2>&1
echo "stage_100k rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 3600 python tools/bench_report.py \
  > bench_results/bench_report_r5.log 2>&1
echo "bench_report rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

timeout 1800 python bench.py >> "$LOG" 2>&1
echo "bench rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
echo "=== r5 queue complete $(date -u +%H:%M:%S) ===" >> "$LOG"
