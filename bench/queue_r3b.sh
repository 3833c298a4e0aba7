#!/bin/bash
# Round-3 TPU queue #2: NTT sweep on the table-as-args code, MSM phase
# probe, MXU-REDC A/B. Serial — one TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r3b queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s] [extra_env...]
  local metric=$1 logn=$2 to=${3:-5400}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r3b_${metric}_${logn}.out" 2> "bench/.r3b_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r3b_${metric}_${logn}.out" >> "$OUT"
  fi
}

run ntt 20
run ntt 22
run ntt 24 7200

echo "=== phase probe 2^22 ($(date -u +%T)Z)" >&2
PROBE_LOG_N=22 timeout 5400 python bench/phase_msm.py \
  > bench/.r3b_phase_22.out 2> bench/.r3b_phase_22.err
cat bench/.r3b_phase_22.out >> "$OUT" 2>/dev/null

echo "=== msm 2^20 MXU-REDC OFF A/B ($(date -u +%T)Z)" >&2
GNARK_TPU_T_MXU=0 BENCH_METRIC=msm BENCH_LOG_N=20 timeout 5400 python bench.py \
  > bench/.r3b_msm20_nomxu.out 2> bench/.r3b_msm20_nomxu.err
sed 's/"metric": "/"metric": "nomxu_/' bench/.r3b_msm20_nomxu.out >> "$OUT" 2>/dev/null

echo "# r3b queue end $(date -u +%FT%TZ)" >> "$OUT"
