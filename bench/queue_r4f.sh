#!/bin/bash
# Round-4 queue #6: WARM 2-chain outer prove (kernels cached; measures the
# steady-state recursion latency; also seeds the unified 1024-pad shapes).
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r4f queue start $(date -u +%FT%TZ)" >> "$OUT"
rm -rf .2chain_ck/prove_ck   # force a fresh prove (don't resume the old one)
timeout 10800 python tools/run_2chain_device.py \
  > bench/.r4f_2chain.out 2> bench/.r4f_2chain.err
echo "# r4f 2chain(warm) rc=$? (see bench/.r4f_2chain.out)" >> "$OUT"
echo "# r4f queue end $(date -u +%FT%TZ)" >> "$OUT"
