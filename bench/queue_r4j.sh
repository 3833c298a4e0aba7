#!/bin/bash
# Round-4 queue #9: fused-sort MSM at the 2^24 north star + groth16 2^17
# with the round's prover fixes (solve coalescing, overlapped staging).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4j queue start $(date -u +%FT%TZ)" >> "$OUT"
run() {
  local metric=$1 logn=$2 to=$3 tag=$4
  env BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r4j_${tag}.out" 2> "bench/.r4j_${tag}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"tag\": \"${tag}\", \"error\": $rc}" >> "$OUT"
  else
    sed "s/\"metric\": \"/\"metric\": \"${tag}:/" "bench/.r4j_${tag}.out" >> "$OUT"
  fi
}
run msm 24 10800 sortfused_msm_24
run groth16 17 10800 groth16_17_r4
echo "# r4j queue end $(date -u +%FT%TZ)" >> "$OUT"
