#!/bin/bash
# Round-3 continuation queue #2: A/B the batch-affine MSM wave
# (GNARK_TPU_AFFINE_MSM=1) at 2^20/2^22, re-run groth16 2^17 with the new
# per-stage prove logging (solve/computeH/pk-staging/msms breakdown), then
# the 2-chain outer BW6 device prove (stages cached in .2chain_ck/).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4b queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n timeout_s tag [env pairs...]
  local metric=$1 logn=$2 to=$3 tag=$4; shift 4
  echo "=== $tag $metric 2^$logn ($(date -u +%T)Z)" >&2
  env "$@" BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r4b_${tag}.out" 2> "bench/.r4b_${tag}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"tag\": \"${tag}\", \"error\": $rc}" >> "$OUT"
  else
    sed "s/\"metric\": \"/\"metric\": \"${tag}:/" "bench/.r4b_${tag}.out" >> "$OUT"
  fi
}

run msm 20 7200 affine_msm_20 GNARK_TPU_AFFINE_MSM=1
run msm 22 7200 affine_msm_22 GNARK_TPU_AFFINE_MSM=1
run groth16 17 7200 groth16_17_breakdown

echo "=== 2chain device prove ($(date -u +%T)Z)" >&2
timeout 10800 python tools/run_2chain_device.py \
  > bench/.r4b_2chain.out 2> bench/.r4b_2chain.err
echo "# r4b 2chain rc=$? (see bench/.r4b_2chain.out)" >> "$OUT"

echo "# r4b queue end $(date -u +%FT%TZ)" >> "$OUT"
