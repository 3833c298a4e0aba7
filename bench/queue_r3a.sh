#!/bin/bash
# Round-3 TPU job queue (serial — ONE TPU process at a time).
# Waits for the in-flight msm22 bench to finish, then runs the rest of
# the measurement matrix. Appends to bench/SWEEP.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl

# wait for the in-flight msm 2^22 run (writes exit= to its .out at the end)
while [ -f bench/.r3_msm22.out ] && ! grep -q '^exit=' bench/.r3_msm22.out; do
  sleep 20
done

echo "# r3 queue start $(date -u +%FT%TZ)" >> "$OUT"

run() { # metric log_n [timeout_s]
  local metric=$1 logn=$2 to=${3:-5400}
  echo "=== $metric 2^$logn ($(date -u +%T)Z)" >&2
  BENCH_METRIC=$metric BENCH_LOG_N=$logn timeout "$to" python bench.py \
    > "bench/.r3_${metric}_${logn}.out" 2> "bench/.r3_${metric}_${logn}.err"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"metric\": \"${metric}_2^${logn}\", \"error\": $rc}" >> "$OUT"
  else
    cat "bench/.r3_${metric}_${logn}.out" >> "$OUT"
  fi
}

run ntt 24
run msm 24 7200
echo "# r3 queue end $(date -u +%FT%TZ)" >> "$OUT"
