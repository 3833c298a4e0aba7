#!/bin/bash
# Round-5 queue #3: computeH breakdown at 2^20, 2-chain marginal latency.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5c queue start $(date -u +%FT%TZ)" >> "$OUT"

env BENCH_METRIC=groth16 BENCH_LOG_N=20 BENCH_ITERS=3 GNARK_TPU_H_TIMING=1 \
  timeout 7200 python bench.py \
  > bench/.r5c_g16_20.out 2> bench/.r5c_g16_20.err \
  && cat bench/.r5c_g16_20.out >> "$OUT" \
  || echo "{\"metric\": \"groth16_2^20\", \"error\": $?}" >> "$OUT"

timeout 10800 python tools/run_2chain_device.py --iters 2 \
  > bench/.r5c_2chain.out 2> bench/.r5c_2chain.err \
  && grep "marginal\|PROVE OK" bench/.r5c_2chain.out >> "$OUT" \
  || echo "{\"metric\": \"2chain_marginal\", \"error\": $?}" >> "$OUT"

echo "# r5c queue end $(date -u +%FT%TZ)" >> "$OUT"

# G2 2^24 retry (host-staged generation fixes the r5a HBM OOM)
env BENCH_METRIC=msm_g2 BENCH_LOG_N=24 BENCH_ITERS=2 timeout 7200 \
  python bench.py > bench/.r5c_g2_24.out 2> bench/.r5c_g2_24.err \
  && cat bench/.r5c_g2_24.out >> "$OUT" \
  || echo "{\"metric\": \"msm_g2_2^24_retry\", \"error\": $?}" >> "$OUT"
echo "# r5c queue really end $(date -u +%FT%TZ)" >> "$OUT"
