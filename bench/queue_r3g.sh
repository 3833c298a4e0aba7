#!/bin/bash
# Round-3 TPU queue #5 (final measurement pass): staged-scalar MSM
# re-measure at 2^22/2^24, G2 with the Fp2-MXU kernel, the c=11@2^14
# crash check, and the fixed phase probe.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r3g queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-7200}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r3g_${metric}_${logn}.out" 2> "bench/.r3g_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r3g_${metric}_${logn}.out" >> "$OUT"
  fi
}

run msm 22
run msm 24 9000
run msm_g2 18
run msm 14 1800

echo "=== phase probe 2^22 ($(date -u +%T)Z)" >&2
PROBE_LOG_N=22 timeout 5400 python bench/phase_msm.py \
  > bench/.r3g_phase_22.out 2> bench/.r3g_phase_22.err
cat bench/.r3g_phase_22.out >> "$OUT" 2>/dev/null

echo "# r3g queue end $(date -u +%FT%TZ)" >> "$OUT"
