#!/bin/bash
# Round-4 queue #7: third warm 2-chain attempt (probes whether the r4g
# cache entries serve a fresh process), then G2 MSM 2^22.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4h queue start $(date -u +%FT%TZ)" >> "$OUT"
rm -rf .2chain_ck/prove_ck
timeout 10800 python tools/run_2chain_device.py \
  > bench/.r4h_2chain.out 2> bench/.r4h_2chain.err
echo "# r4h 2chain(warm2) rc=$? (see bench/.r4h_2chain.out)" >> "$OUT"
env BENCH_METRIC=msm_g2 BENCH_LOG_N=22 timeout 7200 python bench.py \
  > bench/.r4h_msmg2_22.out 2> bench/.r4h_msmg2_22.err \
  && cat bench/.r4h_msmg2_22.out >> "$OUT" \
  || echo '{"metric": "msm_g2_2^22", "error": 1}' >> "$OUT"
echo "# r4h queue end $(date -u +%FT%TZ)" >> "$OUT"
