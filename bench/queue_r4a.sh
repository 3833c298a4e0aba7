#!/bin/bash
# Round-3 continuation TPU queue: finish the r3g measurement pass that the
# round snapshot interrupted — staged-scalar MSM 2^24, G2 2^18 with the
# Fp2-MXU REDC tables (A/B vs the 51.2k pre-MXU number), and the
# c=11 @ 2^14 Mosaic crash check.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4a queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-7200}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r4a_${metric}_${logn}.out" 2> "bench/.r4a_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r4a_${metric}_${logn}.out" >> "$OUT"
  fi
}

run msm 24 9000
run msm_g2 18 7200
run msm 14 1800

echo "# r4a queue end $(date -u +%FT%TZ)" >> "$OUT"
