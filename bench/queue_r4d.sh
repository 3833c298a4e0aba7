#!/bin/bash
# Round-4 queue #4: retry the 2-chain outer BW6 device prove (redc_tables
# pad fix), then staged MSM 2^22/2^20 re-measure with the fused phase-A
# sort (one payload-carrying lax.sort instead of argsort + 3 gathers).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4d queue start $(date -u +%FT%TZ)" >> "$OUT"

echo "=== 2chain device prove retry ($(date -u +%T)Z)" >&2
timeout 14400 python tools/run_2chain_device.py \
  > bench/.r4d_2chain.out 2> bench/.r4d_2chain.err
echo "# r4d 2chain rc=$? (see bench/.r4d_2chain.out)" >> "$OUT"

run() { # metric log_n timeout_s tag
  local metric=$1 logn=$2 to=$3 tag=$4
  echo "=== $tag $metric 2^$logn ($(date -u +%T)Z)" >&2
  env BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r4d_${tag}.out" 2> "bench/.r4d_${tag}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"tag\": \"${tag}\", \"error\": $rc}" >> "$OUT"
  else
    sed "s/\"metric\": \"/\"metric\": \"${tag}:/" "bench/.r4d_${tag}.out" >> "$OUT"
  fi
}

run msm 22 7200 sortfused_msm_22
run msm 20 7200 sortfused_msm_20

echo "# r4d queue end $(date -u +%FT%TZ)" >> "$OUT"
