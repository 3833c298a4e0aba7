#!/bin/bash
# Round-5 queue #7: plonk 2^20 retry with the uint16 coset-eval residency
# fix (r5e attempt OOM'd HBM: 13 int32 4n-eval arrays resident), after
# the r5f batch-MSM queue drains.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5g queue start $(date -u +%FT%TZ) (waiting for r5f)" >> "$OUT"
for i in $(seq 1 300); do
  grep -q "r5f queue end" "$OUT" && break
  sleep 120
done
echo "# r5g go $(date -u +%FT%TZ)" >> "$OUT"

env BENCH_METRIC=plonk BENCH_LOG_N=20 BENCH_ITERS=2 timeout 10800 \
  python bench.py > bench/.r5g_plonk_20.out 2> bench/.r5g_plonk_20.err \
  && cat bench/.r5g_plonk_20.out >> "$OUT" \
  || echo "{\"metric\": \"plonk_2^20_retry\", \"error\": $?}" >> "$OUT"

# batched-commit A/B at the same domain (a/b/c + t shards ride one wave
# loop): only runs if the plain retry succeeded
if grep -q '"value"' bench/.r5g_plonk_20.out 2>/dev/null; then
  env GNARK_TPU_BATCH_MSM=1 BENCH_METRIC=plonk BENCH_LOG_N=20 \
    BENCH_ITERS=2 timeout 10800 python bench.py \
    > bench/.r5g_plonk_batch.out 2> bench/.r5g_plonk_batch.err \
    && sed 's/plonk_prove/batchmsm_plonk_prove/' \
      bench/.r5g_plonk_batch.out >> "$OUT" \
    || echo "{\"metric\": \"plonk_batch_retry\", \"error\": $?}" >> "$OUT"
fi
echo "# r5g queue end $(date -u +%FT%TZ)" >> "$OUT"
