#!/bin/bash
# Round-3 TPU queue #4: G2 MSM (VMEM-fixed TCurve2), ntt 2^24 (donated
# inputs), groth16 2^17 (linear compile), fresh msm 2^20 (staged scalars).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r3e queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-5400}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r3e_${metric}_${logn}.out" 2> "bench/.r3e_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r3e_${metric}_${logn}.out" >> "$OUT"
  fi
}

run msm 20
run ntt 24 7200
run groth16 17 7200
run msm_g2 18
echo "# r3e queue end $(date -u +%FT%TZ)" >> "$OUT"
