#!/bin/bash
# Round-3 TPU queue #3: fixed phase probe, ntt 2^24 (lazy tables +
# permutation-free bench), G2 MSM (TCurve2), groth16 prove latency.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r3c queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-5400}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r3c_${metric}_${logn}.out" 2> "bench/.r3c_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r3c_${metric}_${logn}.out" >> "$OUT"
  fi
}

run msm_g2 16
run ntt 24 7200

echo "=== phase probe 2^22 ($(date -u +%T)Z)" >&2
PROBE_LOG_N=22 timeout 5400 python bench/phase_msm.py \
  > bench/.r3c_phase_22.out 2> bench/.r3c_phase_22.err
cat bench/.r3c_phase_22.out >> "$OUT" 2>/dev/null

run groth16 17 7200
echo "# r3c queue end $(date -u +%FT%TZ)" >> "$OUT"
