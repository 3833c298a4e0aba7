#!/bin/bash
# Round-4 TPU queue #3: the 2-chain outer BW6 device prove (checkpoint
# binding width bug fixed — prove.py to_bytes(nb)), groth16 2^20 re-measure
# with the 34x-faster coalesced-level solve (VERDICT r3 #2: target <=60s
# warm), and G2 MSM at 2^20 (VERDICT r3 #9).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4c queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n timeout_s tag [env pairs...]
  local metric=$1 logn=$2 to=$3 tag=$4; shift 4
  echo "=== $tag $metric 2^$logn ($(date -u +%T)Z)" >&2
  env "$@" BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r4c_${tag}.out" 2> "bench/.r4c_${tag}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"tag\": \"${tag}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r4c_${tag}.out" >> "$OUT"
  fi
}

echo "=== 2chain device prove ($(date -u +%T)Z)" >&2
timeout 14400 python tools/run_2chain_device.py \
  > bench/.r4c_2chain.out 2> bench/.r4c_2chain.err
echo "# r4c 2chain rc=$? (see bench/.r4c_2chain.out)" >> "$OUT"

run groth16 20 10800 groth16_20_fastsolve
run msm_g2 20 10800 msm_g2_20

echo "# r4c queue end $(date -u +%FT%TZ)" >> "$OUT"
