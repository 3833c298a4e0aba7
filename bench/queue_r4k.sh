#!/bin/bash
# Round-4 queue #10: post-sort-fusion MSM phase budget + NTT re-measures.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4k queue start $(date -u +%FT%TZ)" >> "$OUT"
timeout 7200 python bench/phase_msm.py >> "$OUT" 2> bench/.r4k_phase.err \
  || echo '# r4k phase_msm failed' >> "$OUT"
for LN in 22 24; do
  env BENCH_METRIC=ntt BENCH_LOG_N=$LN timeout 7200 python bench.py \
    > "bench/.r4k_ntt_${LN}.out" 2> "bench/.r4k_ntt_${LN}.err" \
    && cat "bench/.r4k_ntt_${LN}.out" >> "$OUT" \
    || echo "{\"metric\": \"ntt_2^${LN}\", \"error\": $?}" >> "$OUT"
done
echo "# r4k queue end $(date -u +%FT%TZ)" >> "$OUT"
