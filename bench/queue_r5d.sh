#!/bin/bash
# Round-5 queue #4: fused-add device bit-exactness + staged MSM A/B.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5d queue start $(date -u +%FT%TZ)" >> "$OUT"

timeout 5400 python bench/check_fused_add.py \
  > bench/.r5d_fused_check.out 2> bench/.r5d_fused_check.err \
  && cat bench/.r5d_fused_check.out >> "$OUT" \
  || { echo "{\"check\": \"fused_add\", \"error\": $?}" >> "$OUT"; \
       echo "# r5d aborted (fused check failed)" >> "$OUT"; exit 1; }

for LN in 20 22; do
  env GNARK_TPU_FUSED_ADD=1 BENCH_METRIC=msm BENCH_LOG_N=$LN timeout 7200 \
    python bench.py > "bench/.r5d_fused_msm_${LN}.out" 2> "bench/.r5d_fused_msm_${LN}.err" \
    && sed "s/msm_g1/fusedadd_msm_g1/" "bench/.r5d_fused_msm_${LN}.out" >> "$OUT" \
    || echo "{\"metric\": \"fused_msm_2^${LN}\", \"error\": $?}" >> "$OUT"
done
echo "# r5d queue end $(date -u +%FT%TZ)" >> "$OUT"

# PLONK 2^20 retry (chunked 4n quotient fixes the r5a HBM OOM)
env BENCH_METRIC=plonk BENCH_LOG_N=20 BENCH_ITERS=2 timeout 10800 \
  python bench.py > bench/.r5d_plonk_20.out 2> bench/.r5d_plonk_20.err \
  && cat bench/.r5d_plonk_20.out >> "$OUT" \
  || echo "{\"metric\": \"plonk_2^20_retry\", \"error\": $?}" >> "$OUT"
echo "# r5d queue really end $(date -u +%FT%TZ)" >> "$OUT"

# G2 fused Karatsuba add: compile-size gamble (timeout-bounded), then A/B
timeout 3600 python bench/check_fused_add.py --g2 \
  > bench/.r5d_fused2_check.out 2> bench/.r5d_fused2_check.err \
  && cat bench/.r5d_fused2_check.out >> "$OUT" \
  || echo "{\"check\": \"fused_add2\", \"error\": $?}" >> "$OUT"
if grep -q '"exact": true' bench/.r5d_fused2_check.out 2>/dev/null; then
  env GNARK_TPU_FUSED_ADD2=1 BENCH_METRIC=msm_g2 BENCH_LOG_N=22 BENCH_ITERS=2 \
    timeout 7200 python bench.py \
    > bench/.r5d_fused_g2_22.out 2> bench/.r5d_fused_g2_22.err \
    && sed "s/msm_g2/fusedadd_msm_g2/" bench/.r5d_fused_g2_22.out >> "$OUT" \
    || echo "{\"metric\": \"fused_g2_2^22\", \"error\": $?}" >> "$OUT"
fi
echo "# r5d queue REALLY end $(date -u +%FT%TZ)" >> "$OUT"
