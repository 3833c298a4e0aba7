#!/bin/bash
# Round-5 queue #5: tunnel-recovery retries — fused A/B, plonk 2^20,
# G2 fused check, G2 2^24. Waits (up to ~6h) for the axon tunnel first.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5e queue start $(date -u +%FT%TZ) (waiting for tunnel)" >> "$OUT"
for i in $(seq 1 72); do
  if timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones((2,)).sum()" >/dev/null 2>&1; then
    echo "# r5e tunnel back after $i probes $(date -u +%FT%TZ)" >> "$OUT"
    break
  fi
  sleep 300
done

for LN in 20 22; do
  env GNARK_TPU_FUSED_ADD=1 BENCH_METRIC=msm BENCH_LOG_N=$LN timeout 9000 \
    python bench.py > "bench/.r5e_fused_msm_${LN}.out" 2> "bench/.r5e_fused_msm_${LN}.err" \
    && sed "s/msm_g1/fusedadd_msm_g1/" "bench/.r5e_fused_msm_${LN}.out" >> "$OUT" \
    || echo "{\"metric\": \"fused_msm_2^${LN}\", \"error\": $?}" >> "$OUT"
done

env BENCH_METRIC=plonk BENCH_LOG_N=20 BENCH_ITERS=2 timeout 10800 \
  python bench.py > bench/.r5e_plonk_20.out 2> bench/.r5e_plonk_20.err \
  && cat bench/.r5e_plonk_20.out >> "$OUT" \
  || echo "{\"metric\": \"plonk_2^20\", \"error\": $?}" >> "$OUT"

timeout 3600 python bench/check_fused_add.py --g2 \
  > bench/.r5e_fused2_check.out 2> bench/.r5e_fused2_check.err \
  && cat bench/.r5e_fused2_check.out >> "$OUT" \
  || echo "{\"check\": \"fused_add2\", \"error\": $?}" >> "$OUT"
if grep -q '"exact": true' bench/.r5e_fused2_check.out 2>/dev/null; then
  env GNARK_TPU_FUSED_ADD2=1 BENCH_METRIC=msm_g2 BENCH_LOG_N=22 BENCH_ITERS=2 \
    timeout 7200 python bench.py \
    > bench/.r5e_fused_g2_22.out 2> bench/.r5e_fused_g2_22.err \
    && sed "s/msm_g2/fusedadd_msm_g2/" bench/.r5e_fused_g2_22.out >> "$OUT" \
    || echo "{\"metric\": \"fused_g2_2^22\", \"error\": $?}" >> "$OUT"
fi

env BENCH_METRIC=msm_g2 BENCH_LOG_N=24 BENCH_ITERS=2 timeout 7200 \
  python bench.py > bench/.r5e_g2_24.out 2> bench/.r5e_g2_24.err \
  && cat bench/.r5e_g2_24.out >> "$OUT" \
  || echo "{\"metric\": \"msm_g2_2^24\", \"error\": $?}" >> "$OUT"
echo "# r5e queue end $(date -u +%FT%TZ)" >> "$OUT"

# final: the driver-default suite (warms the exact BENCH_r5 shapes incl.
# the new u16 to_mont jit) and records our own copy of the three lines
timeout 10800 python bench.py > bench/.r5e_suite.out 2> bench/.r5e_suite.err \
  && cat bench/.r5e_suite.out >> "$OUT" \
  || echo "{\"metric\": \"default_suite\", \"error\": $?}" >> "$OUT"
echo "# r5e queue REALLY end $(date -u +%FT%TZ)" >> "$OUT"
