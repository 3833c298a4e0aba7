#!/bin/bash
# Round-4 queue #5: third 2-chain attempt (K-scaled VMEM lane blocks), then
# NTT re-measure at 2^20 (regression check after the round's kernel edits).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4e queue start $(date -u +%FT%TZ)" >> "$OUT"

echo "=== 2chain device prove attempt 3 ($(date -u +%T)Z)" >&2
timeout 14400 python tools/run_2chain_device.py \
  > bench/.r4e_2chain.out 2> bench/.r4e_2chain.err
echo "# r4e 2chain rc=$? (see bench/.r4e_2chain.out)" >> "$OUT"

BENCH_METRIC=ntt BENCH_LOG_N=20 timeout 3600 python bench.py \
  > bench/.r4e_ntt20.out 2> bench/.r4e_ntt20.err \
  && cat bench/.r4e_ntt20.out >> "$OUT" \
  || echo '{"metric": "ntt_2^20", "error": 1}' >> "$OUT"

echo "# r4e queue end $(date -u +%FT%TZ)" >> "$OUT"
