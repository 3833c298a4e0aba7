#!/bin/bash
# Round-4 queue #8: first-ever on-chip PLONK prove latency (2^15, 2^17).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4i queue start $(date -u +%FT%TZ)" >> "$OUT"
for LN in 15 17; do
  env BENCH_METRIC=plonk BENCH_LOG_N=$LN timeout 10800 python bench.py \
    > "bench/.r4i_plonk_${LN}.out" 2> "bench/.r4i_plonk_${LN}.err" \
    && cat "bench/.r4i_plonk_${LN}.out" >> "$OUT" \
    || echo "{\"metric\": \"plonk_2^${LN}\", \"error\": $?}" >> "$OUT"
done
echo "# r4i queue end $(date -u +%FT%TZ)" >> "$OUT"
