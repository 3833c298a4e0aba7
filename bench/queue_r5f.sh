#!/bin/bash
# Round-5 queue #6: batched multi-MSM (msm_batch) device validation + A/B.
# Waits for the r5e queue to finish (one TPU process at a time), then:
#   1. bit-exactness + dispatch A/B at 2^16 (bn254 G1, M=3)
#   2. 2-chain marginal prove with GNARK_TPU_BATCH_MSM=1 (vs 33.8 s r5c)
#   3. groth16 2^20 marginal with GNARK_TPU_BATCH_MSM=1 (vs 43.3 s r5c)
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5f queue start $(date -u +%FT%TZ) (waiting for r5e)" >> "$OUT"
for i in $(seq 1 200); do
  grep -q "r5e queue REALLY end" "$OUT" && break
  sleep 120
done
echo "# r5f go $(date -u +%FT%TZ)" >> "$OUT"

timeout 7200 python bench/check_batch_msm.py \
  > bench/.r5f_batch_check.out 2> bench/.r5f_batch_check.err \
  && cat bench/.r5f_batch_check.out >> "$OUT" \
  || echo "{\"check\": \"batch_msm\", \"error\": $?}" >> "$OUT"

if grep -q '"exact": true' bench/.r5f_batch_check.out 2>/dev/null; then
  env GNARK_TPU_BATCH_MSM=1 timeout 10800 \
    python tools/run_2chain_device.py --iters 2 \
    > bench/.r5f_2chain_batch.out 2> bench/.r5f_2chain_batch.err \
    && grep "marginal" bench/.r5f_2chain_batch.out | \
       sed 's/^/# r5f batch-msm /' >> "$OUT" \
    || echo "{\"metric\": \"2chain_batch_msm\", \"error\": $?}" >> "$OUT"

  env GNARK_TPU_BATCH_MSM=1 BENCH_METRIC=groth16 BENCH_LOG_N=20 \
    BENCH_ITERS=3 timeout 10800 python bench.py \
    > bench/.r5f_groth16_batch.out 2> bench/.r5f_groth16_batch.err \
    && sed 's/groth16_prove/batchmsm_groth16_prove/' \
       bench/.r5f_groth16_batch.out >> "$OUT" \
    || echo "{\"metric\": \"groth16_batch_msm\", \"error\": $?}" >> "$OUT"
fi
echo "# r5f queue end $(date -u +%FT%TZ)" >> "$OUT"
