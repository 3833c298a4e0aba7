#!/bin/bash
# Full TPU bench sweep (ROADMAP #1): run each mode/size serially on the
# one real chip, append JSON lines to bench/SWEEP.jsonl. Run ONLY when no
# other TPU-touching process is live (the axon worker crashes otherwise).
#
#   bash bench/sweep.sh            # everything (hours incl. compiles)
#   bash bench/sweep.sh quick      # msm 2^20 + ntt 2^20 only
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# sweep start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-3600}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    >> "$OUT" 2> "bench/.last_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
    tail -3 "bench/.last_${metric}_${logn}.err" >&2
  fi
}

if [ "${1:-}" = "quick" ]; then
  run msm 20; run ntt 20
  exit 0
fi

run msm 20
run ntt 20
run msm 22
run ntt 22
run msm 24 5400
run ntt 24 5400
run groth16 20 7200
echo "# sweep end $(date -u +%FT%TZ)" >> "$OUT"
